"""Probe: why does the bench's classifier-crop plane fall back to raw?

Runs ONE detect batch over the bench's 8 jittered frames on the real chip,
then replays the host crop-gather for each frame and compares the crop
planes of consecutive evolving-stream batches: how many slots differ, are
the rects identical, and what the per-segment delta spans look like.

Usage: python tools/crop_delta_probe.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import cv2

    sys.path.insert(0, ROOT)
    import bench

    stream = bench.build_stream()
    frames = bench.make_frames()

    # one submit per distinct frame-set start gives detections for all 8
    stream.submit_batch([frames[i % 8] for i in range(bench.BATCH)])
    out = stream.collect_batch()

    # per-frame crop plane + rects, replicating _finish_batch's gather
    rects = []
    planes = []
    for fi in range(8):
        dets = out[fi]
        frame = frames[fi]
        h, w = frame.shape[:2]
        plane = np.zeros((stream.max_rank, 64, 64, 3), np.uint8)
        rr = []
        cands = []
        p = stream.crop_pad
        for d in dets:
            if d["class_id"] not in stream._rank_ids:
                continue
            x1, y1, x2, y2 = d["bbox"]
            rect = stream._stable_rect(
                d["class_id"],
                (max(0, int(y1) - p), max(0, int(x1) - p),
                 int(y2) + p, int(x2) + p),
            )
            cands.append((d["class_id"], rect, d["class_name"]))
        cands.sort(key=lambda c: c[:2])
        for taken, (cid, rect, cname) in enumerate(cands[: stream.max_rank]):
            ys, xs, ye, xe = rect
            crop = frame[ys:ye, xs:xe]
            if crop.size == 0:
                continue
            ch, cw = crop.shape[:2]
            s = 64 / min(ch, cw)
            nh, nw = max(64, round(ch * s)), max(64, round(cw * s))
            resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
            t, l = (nh - 64) // 2, (nw - 64) // 2
            plane[taken] = resized[t : t + 64, l : l + 64]
            rr.append((cname,) + rect)
        rects.append(rr)
        planes.append(plane)

    for fi in range(8):
        print(f"frame {fi}: {len(rects[fi])} rank crops")
        for r in rects[fi]:
            print("   ", r)

    # consecutive-frame comparison (what the slot-wise crop delta sees)
    for fi in range(8):
        a, b = planes[fi], planes[(fi + 1) % 8]
        d = b.astype(np.int16) - a.astype(np.int16)
        segs = d.reshape(-1, 64 * 3)  # full-row segments like the encoder
        span = segs.max(axis=1) - segs.min(axis=1)
        hist = {
            "const": int((span == 0).sum()),
            "<=1": int(((span > 0) & (span <= 1)).sum()),
            "<=3": int(((span > 1) & (span <= 3)).sum()),
            "<=7": int(((span > 3) & (span <= 7)).sum()),
            "<=15": int(((span > 7) & (span <= 15)).sum()),
            "raw": int((span > 15).sum()),
        }
        same_rects = rects[fi] == rects[(fi + 1) % 8]
        print(f"{fi}->{(fi + 1) % 8}: rects_equal={same_rects} span_hist={hist}")

    # real encoder on the stabilized planes: class counts + payload bytes
    from manual_yolo_tpu.runtime import native

    segw = 64
    segb = segw * 3
    nseg = planes[0].shape[0] * 64
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb
    raw_bytes = planes[0].size
    for fi in range(8):
        a, b = planes[fi], planes[(fi + 1) % 8]
        bufs = (
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q2, np.uint8),
            np.zeros(nseg * q3, np.uint8), np.zeros(nseg * qr, np.uint8),
            np.zeros(nseg, np.uint8), np.zeros(nseg, np.uint8),
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q1, np.uint8),
            np.zeros(nseg * segb, np.uint8), np.zeros(nseg * segb, np.uint8),
            np.zeros(nseg * 3, np.uint8), np.zeros(nseg, np.uint8),
        )
        counts = native.seg_encode(b, a, 0, 64, segw, *bufs)
        k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4, d8 = counts
        k0 = nseg - k1 - k2 - k3 - kr - k4m - k10m
        payload = (q1 * k1 + q2 * k2 + q3 * k3 + qr * kr
                   + k4m + k10m + 3 * (d4 + d8) + (nz4 + 1) // 2 + nz8)
        print(
            f"{fi}->{(fi + 1) % 8}: const={k0} 1b={k1} 2b={k2} 3b={k3} "
            f"raw={kr} sp4={k4m} sp8={k10m} "
            f"payload={payload}B ({100 * payload / raw_bytes:.1f}% "
            f"of raw {raw_bytes}B)"
        )


if __name__ == "__main__":
    main()

"""Measure residual sparsity inside payload-carrying segments of the bench
stream's canvas + crop deltas: if few pixels deviate from the segment's
best constant predictor, a mask+exceptions class beats dense 2/3-bit.

Usage: JAX_PLATFORMS=cpu python tools/sparsity_probe.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def analyze(cur, prev, segw, label):
    """cur/prev: (N, h, w, 3) u8 planes. Segments = segw px of a row."""
    N, h, w, _ = cur.shape
    segb = segw * 3
    d = (cur.astype(np.int16) - prev.astype(np.int16)).reshape(N, h, w // segw, segw * 3)
    d = np.moveaxis(d, 2, 1).reshape(-1, segb)  # (nseg, segb) per-seg deltas
    # per-channel span (the encoder classifies per channel, but approximate
    # with whole-segment span on the interleaved bytes per channel)
    dc = d.reshape(-1, segw, 3)
    span = dc.max(axis=1) - dc.min(axis=1)  # (nseg, 3)
    smax = span.max(axis=1)
    const = smax == 0
    # best constant predictor per segment per channel: the mode
    nseg = d.shape[0]
    nonconst = ~const
    idx = np.where(nonconst)[0]
    # mode per segment-channel via bincount over shifted values
    sub = dc[idx] + 256  # (k, segw, 3) in [0, 512)
    k = sub.shape[0]
    nz_counts = np.zeros(k, np.int32)
    val_range = np.zeros(k, np.int32)
    for i in range(k):
        seg = sub[i]
        resid = np.empty_like(seg)
        for ch in range(3):
            cnts = np.bincount(seg[:, ch], minlength=512)
            mode = cnts.argmax()
            resid[:, ch] = seg[:, ch] - mode
        nz = resid != 0
        nz_counts[i] = nz.sum()
        val_range[i] = np.abs(resid).max()
    segbytes = segb
    cur_bytes = np.where(smax <= 1, segb // 8,
                np.where(smax <= 3, segb // 4,
                np.where(smax <= 7, segb * 3 // 8, segb)))
    # mask+exceptions scheme: mask segb/8 B + 1 B per nonzero value
    sparse_bytes = segb // 8 + nz_counts
    # mask + packed small exceptions (4-bit if |resid|<=7)
    sparse4 = segb // 8 + np.where(val_range <= 7, (nz_counts + 1) // 2,
                                   nz_counts)
    print(f"\n== {label}: nseg={nseg} const={const.sum()} "
          f"payload_segs={k}")
    q = lambda a: [int(np.percentile(a, p)) for p in (10, 50, 90, 99)]
    print(f" nz per payload seg (of {segw * 3} vals): p10/50/90/99 = {q(nz_counts)}")
    print(f" |resid| max p10/50/90/99 = {q(val_range)}")
    cb = int(cur_bytes[idx].sum())
    sb = int(np.minimum(sparse_bytes, cur_bytes[idx]).sum())
    s4 = int(np.minimum(sparse4, cur_bytes[idx]).sum())
    print(f" payload bytes: current(dense cls)={cb/1e6:.3f}MB "
          f"mask+u8exc={sb/1e6:.3f}MB mask+nib_exc={s4/1e6:.3f}MB")


def main():
    import bench

    frames = bench.make_frames()
    import cv2

    from manual_yolo_tpu.ops.letterbox import letterbox_params
    from manual_yolo_tpu.runtime import native

    h, w = bench.SRC_HW
    r, nh, nw, top, left = letterbox_params((h, w), (640, 640))
    B = bench.BATCH

    def canv(t):
        out = np.zeros((B, nh, 640, 3), np.uint8)
        for i in range(B):
            f = frames[(t + i) % len(frames)]
            s = round(1 / r)
            if not native.decimate_u8_into(f, out[i], s):
                cv2.resize(f, (nw, nh), dst=out[i],
                           interpolation=cv2.INTER_LINEAR)
        return out

    c0, c1 = canv(0), canv(1)
    analyze(c1, c0, 40, "canvas(40px segs)")

    # crop plane at labeled rank rects
    from manual_yolo_tpu.game import taxonomy

    _, rects = bench._load_base()
    card = [(y1, x1, y2, x2) for nm, (x1, y1, x2, y2) in sorted(rects.items())
            if nm in taxonomy.RANK_CLASSES][:8]

    def crop_plane(t):
        out = np.zeros((B * 8, 64, 64, 3), np.uint8)
        for i in range(B):
            f = frames[(t + i) % len(frames)]
            for j, (y1, x1, y2, x2) in enumerate(card):
                c = f[max(0, y1 - 6):y2 + 6, max(0, x1 - 6):x2 + 6]
                ch, cw = c.shape[:2]
                s = 64 / min(ch, cw)
                nh2, nw2 = max(64, round(ch * s)), max(64, round(cw * s))
                rs = cv2.resize(c, (nw2, nh2), interpolation=cv2.INTER_LINEAR)
                tt, ll = (nh2 - 64) // 2, (nw2 - 64) // 2
                out[i * 8 + j] = rs[tt:tt + 64, ll:ll + 64]
        return out

    k0, k1 = crop_plane(0), crop_plane(1)
    analyze(k1, k0, 64, "crops(64px segs)")


if __name__ == "__main__":
    main()

"""Offline byte model for the segs delta encoder: replay the bench's
evolving jitter stream on host and count payload bytes under encoder
variants, WITHOUT touching the chip.

Variants modelled per segment (per-channel delta span s after bias):
  current : const(s==0) / 2-bit(s<=3) / 3-bit(s<=7) / raw
  +1bit   : adds 1-bit class (s<=1)
  +4bit   : adds 4-bit class (s<=15) before raw
Bias block variants:
  dense   : 3 bytes/segment (current)
  packed  : per-slot default (3B) + 1 flag bit/seg + 3B per exception

Usage: python tools/segs_byte_model.py [--segw 80 40] [--crops]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC_HW = (1200, 1920)
BATCH = 32
IMGSZ = 640


def make_frames(n=8):
    rng = np.random.default_rng(0)
    import cv2

    img = cv2.imread("/root/reference/test2.png")
    base = cv2.resize(img, (SRC_HW[1], SRC_HW[0]), interpolation=cv2.INTER_LINEAR)
    frames = []
    for _ in range(n):
        jitter = rng.integers(-6, 7, (1, 1, 3), np.int16)
        frames.append(np.clip(base.astype(np.int16) + jitter, 0, 255).astype(np.uint8))
    return frames


def letterbox_batch(frames):
    """Host letterbox identical in geometry to the serving path (640, full
    width, INTER_LINEAR), content rows only."""
    import cv2

    h, w = SRC_HW
    r = IMGSZ / max(h, w)
    nh, nw = round(h * r), round(w * r)
    out = []
    for f in frames:
        out.append(cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR))
    return np.stack(out)  # (B, nh, 640, 3)


def seg_stats(cur, prev, segw):
    """Per-segment per-channel delta span + bias for one batch of active
    planes shaped (B, nh, W, 3). Returns spans (nseg,), biases (nseg,3)."""
    B, nh, W, _ = cur.shape
    d = cur.astype(np.int16) - prev.astype(np.int16)
    ns_row = W // segw
    d = d.reshape(B, nh, ns_row, segw, 3)
    mn = d.min(axis=3)  # (B, nh, ns_row, 3)
    mx = d.max(axis=3)
    span = (mx - mn).max(axis=-1).reshape(-1)
    bias = mn.reshape(-1, 3)  # (close enough to the clipped-toward-0 bias)
    return span, bias, B * nh * ns_row


def model_bytes(span, bias, nseg, segw, B, variant, bias_mode):
    segb = segw * 3
    n1 = int(((span > 0) & (span <= 1)).sum())
    n2 = int(((span > (1 if "1bit" in variant else 0)) & (span <= 3)).sum())
    n3 = int(((span > 3) & (span <= 7)).sum())
    n4 = int(((span > 7) & (span <= 15)).sum())
    nr = int((span > (15 if "4bit" in variant else 7)).sum())
    nc = int((span == 0).sum())
    pay = 0
    if "1bit" in variant:
        pay += n1 * (segb // 8)
    else:
        n2 += n1
        n1 = 0
    pay += n2 * (segb // 4) + n3 * (segb * 3 // 8)
    if "4bit" in variant:
        pay += n4 * (segb // 2)
    else:
        nr += n4
        n4 = 0
    pay += nr * segb
    ncls = 5 + (1 if "4bit" in variant else 0)
    cls_bytes = nseg // 4 if ncls <= 4 else nseg // 2
    if variant == "current":
        cls_bytes = nseg // 4
    if bias_mode == "dense":
        bias_bytes = nseg * 3
    else:
        per_slot = nseg // B
        bs = bias.reshape(B, per_slot, 3)
        defaults = np.median(bs, axis=1).astype(np.int16)  # (B, 3)
        exc = (bs != defaults[:, None, :]).any(-1).sum()
        bias_bytes = B * 3 + nseg // 8 + int(exc) * 3
    return {
        "classes": dict(const=nc, b1=n1, b2=n2, b3=n3, b4=n4, raw=nr),
        "payload": pay,
        "cls": cls_bytes,
        "bias": bias_bytes,
        "total": pay + cls_bytes + bias_bytes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segw", type=int, nargs="+", default=[80, 40])
    args = ap.parse_args()

    frames = make_frames()
    # evolving stream exactly like bench.measure_stream: slot i of batch t
    # holds frame (t+i) % n
    def batch_at(t):
        return [frames[(t + i) % len(frames)] for i in range(BATCH)]

    planes = {t: letterbox_batch(batch_at(t)) for t in range(4)}
    raw_active = planes[0].nbytes

    for segw in args.segw:
        rows = {}
        for t in range(1, 4):
            span, bias, nseg = seg_stats(planes[t], planes[t - 1], segw)
            for variant in ("current", "1bit", "1bit+4bit"):
                for bias_mode in ("dense", "packed"):
                    key = (variant, bias_mode)
                    r = model_bytes(span, bias, nseg, segw, BATCH, variant, bias_mode)
                    rows.setdefault(key, []).append(r)
        print(f"\n=== segw={segw}  raw_active={raw_active/1e6:.2f} MB ===")
        for (variant, bias_mode), rs in rows.items():
            tot = np.mean([r["total"] for r in rs])
            pay = np.mean([r["payload"] for r in rs])
            bias_b = np.mean([r["bias"] for r in rs])
            cls_b = rs[0]["cls"]
            cl = {k: int(np.mean([r["classes"][k] for r in rs])) for k in rs[0]["classes"]}
            print(
                f"{variant:10s} bias={bias_mode:6s} total={tot/1e6:6.3f} MB "
                f"(pay {pay/1e6:.3f} bias {bias_b/1e6:.3f} cls {cls_b/1e6:.3f}) "
                f"classes {cl}"
            )


if __name__ == "__main__":
    main()

"""Host-only decomposition of the bench stream's per-batch upload bytes.

Replays bench.make_frames() through the EXACT BatchStream encode path
(letterbox -> canvas segs encode -> predicted-crop gather -> crop segs
encode) with JAX pinned to CPU and no program ever dispatched, and prints
where every payload byte goes: canvas payload blocks by segment class,
bucket pad, bias/flag/class trailers, crop plane ditto. This is the map
for the round-5 wire-byte diet (VERDICT r4 item 1).

Usage: JAX_PLATFORMS=cpu python tools/payload_probe.py [n_batches]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def seg_stats(cur, prev, top, nh, segw, nslots):
    """Run native.seg_encode standalone and return class counts + bias
    exception count + per-class payload bytes."""
    from manual_yolo_tpu.runtime import native

    B, H, W, _ = cur.shape
    segb = segw * 3
    nseg = nslots * nh * (W // segw)
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb
    p1 = np.zeros(nseg * q1, np.uint8)
    p2 = np.zeros(nseg * q2, np.uint8)
    p3 = np.zeros(nseg * q3, np.uint8)
    raw = np.zeros(nseg * qr, np.uint8)
    m4 = np.zeros(nseg, np.uint8)
    m8 = np.zeros(nseg, np.uint8)
    s4 = np.zeros(nseg * q1, np.uint8)
    s8 = np.zeros(nseg * q1, np.uint8)
    nib = np.zeros(nseg * segb, np.uint8)
    byt = np.zeros(nseg * segb, np.uint8)
    bias = np.zeros(nseg * 3, np.uint8)
    cls = np.zeros(nseg, np.uint8)
    counts = native.seg_encode(cur, prev, top, nh, segw, p1, p2, p3, raw,
                               m4, m8, s4, s8, nib, byt, bias, cls)
    if counts is None:
        return None
    k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4, d8 = counts
    c = np.bincount(cls[:nseg], minlength=11)
    # bias exceptions: per-slot modal bias, exceptions pay 3 B each
    sps = nseg // nslots
    b = bias[: nseg * 3].reshape(nslots, sps, 3)
    defaults = np.empty((nslots, 3), np.uint8)
    slot_idx = np.arange(nslots, dtype=np.int64)[:, None] * 256
    for ch in range(3):
        cnt = np.bincount((slot_idx + b[:, :, ch]).reshape(-1),
                          minlength=nslots * 256).reshape(nslots, 256)
        defaults[:, ch] = cnt.argmax(axis=1).astype(np.uint8)
    ke = int((~(b == defaults[:, None, :]).all(axis=2)).sum())
    return {
        "nseg": nseg,
        "cls_counts": {i: int(c[i]) for i in range(11) if c[i]},
        "bytes": {
            "p1": q1 * k1, "p2": q2 * k2, "p3": q3 * k3, "raw": qr * kr,
            "masks": k4m + k10m + 3 * (d4 + d8),
            "nib_exc": (nz4 + 1) // 2, "byte_exc": nz8,
            "bias_exc": 3 * ke,
            "flags": (nseg + 7) // 8, "cls": (nseg + 1) // 2,
            "slot_bias": nslots * 3,
        },
        "ke": ke,
    }


def main():
    import bench

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    stream = bench.build_stream()
    frames = bench.make_frames()
    B = bench.BATCH

    # predicted rank-crop rects from the labeled base frame (steady-state
    # stand-in for detector-driven rects; same count cap as the pipeline)
    from manual_yolo_tpu.game import taxonomy

    _, rects = bench._load_base()
    name_to_id = {v: k for k, v in taxonomy.CLASSES.items()}
    p = stream.crop_pad
    card_rects = []
    for nm, (x1, y1, x2, y2) in sorted(rects.items()):
        if nm in taxonomy.RANK_CLASSES:
            card_rects.append(
                (name_to_id[nm],
                 (max(0, y1 - p), max(0, x1 - p), y2 + p, x2 + p))
            )
    card_rects = card_rects[: stream.max_rank]
    print(f"B={B} predicted rank rects/frame={len(card_rects)}")

    tot = {"canvas": 0.0, "crops": 0.0, "batches": 0}
    for t in range(n):
        bf = bench.batch_at(frames, t)
        stream._staging_i = (stream._staging_i + 1) % len(stream._staging)
        staging = stream._staging[stream._staging_i]
        metas = [
            stream._letterbox_into(staging[i], f, (stream._staging_i, i))
            for i, f in enumerate(bf)
        ]
        geom = stream._batch_geom(metas)
        line = f"batch {t}: geom={geom}"
        if stream._prev_staging is not None and geom == stream._prev_geom:
            enc = stream._encode_segs(staging, *geom)
            st = seg_stats(staging, stream._prev_staging, geom[0], geom[1],
                           stream._segw, B)
            if enc is not None:
                pay, npb = enc
                used = sum(st["bytes"].values())
                line += (f" canvas={len(pay)/1e6:.3f}MB"
                         f" (bucket={npb/1e6:.3f} pad="
                         f"{(npb - (used - st['bytes']['flags'] - st['bytes']['cls'] - st['bytes']['slot_bias']))/1e6:.3f})")
                tot["canvas"] += len(pay) / 1e6
            line += f"\n  canvas cls={st['cls_counts']} ke={st['ke']}"
            line += "\n  canvas bytes=" + str(
                {k: round(v / 1e6, 3) for k, v in st["bytes"].items()})
            # crop plane via the real fused-payload builder
            stream._pred_rects = [list(card_rects) for _ in range(B)]
            if enc is not None:
                before = stream._pred_prev_crops
                payload, npk, _ = stream._build_fused_payload(bf, pay)
                kbytes = stream.stage_stats["crops_mb"][-1]
                line += (f"\n  crops={kbytes:.3f}MB npk={npk}"
                         f" total={len(payload)/1e6:.3f}MB")
                tot["crops"] += kbytes
                if before is not None:
                    cst = seg_stats(
                        stream._pred_prev_crops.copy(), before, 0, 64, 64,
                        B * stream.max_rank)
                    line += (f"\n  crops cls={cst['cls_counts']}"
                             f" ke={cst['ke']} bytes=" + str(
                                 {k: round(v / 1e6, 3)
                                  for k, v in cst["bytes"].items()}))
                tot["batches"] += 1
        stream._prev_staging = staging
        stream._prev_metas = list(metas)
        stream._prev_geom = geom
        print(line, flush=True)
    if tot["batches"]:
        print(f"\nmean canvas={tot['canvas']/tot['batches']:.3f}MB "
              f"crops={tot['crops']/tot['batches']:.3f}MB "
              f"total={(tot['canvas']+tot['crops'])/tot['batches']:.3f}MB "
              f"over {tot['batches']} steady batches")


if __name__ == "__main__":
    main()

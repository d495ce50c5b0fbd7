"""Per-stage wall timings of the bench's evolving stream on the real chip.

Prints BatchStream.stage_summary() after a measured run — shows which
pipeline stage (submit letterbox/encode/crops, dispatcher put, device
compute + fetch, finisher tail) bounds the steady-state batch period.

Usage: python tools/stream_stage_probe.py [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import bench

    bench._enable_compile_cache()
    stream = bench.build_stream()
    frames = bench.make_frames()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    fps = bench.measure_stream(stream, frames, meas_batches=0)  # warm only
    stream.reset_stage_stats()
    h0, m0 = stream.fused_hits, stream.fused_misses
    fb0 = stream.fallback_batches
    t0 = time.perf_counter()

    def batch_at(t):
        return [frames[(t + i) % len(frames)] for i in range(bench.BATCH)]

    done = 0
    for t in range(n):
        stream.submit_batch(batch_at(t))
        if stream.in_flight > bench.IN_FLIGHT:
            done += len(stream.collect_batch())
    while stream.in_flight:
        done += len(stream.collect_batch())
    wall = time.perf_counter() - t0
    def _mb(key):
        v = sorted(stream.stage_stats.get(key, []))
        return {
            "p50": round(v[len(v) // 2], 2), "max": round(v[-1], 2),
            "n": len(v),
        } if v else None

    segc = stream.stage_stats.get("canvas_seg_counts", [])
    seg_split = None
    if segc:
        tot = [sum(c[i] for c in segc) for i in range(len(segc[0]))]
        nseg = tot[0]
        if len(tot) >= 11:  # nseg,k1,k2,k3,kraw,km4,km8,nz4,nz8,d4,d8
            payload_segs = sum(tot[1:7])
            seg_split = {
                "segments": nseg // len(segc),
                "k1bit": round(tot[1] / nseg, 4),
                "k2bit": round(tot[2] / nseg, 4),
                "k3bit": round(tot[3] / nseg, 4),
                "kraw": round(tot[4] / nseg, 4),
                "ksparse_nib": round(tot[5] / nseg, 4),
                "ksparse_byte": round(tot[6] / nseg, 4),
                "nz_nib_per_batch": tot[7] // len(segc),
                "nz_byte_per_batch": tot[8] // len(segc),
                "const_or_shift": round(1 - payload_segs / nseg, 4),
            }
        else:
            seg_split = {"raw_counts": tot}
    print(json.dumps({
        "fps": round(done / wall, 1),
        "batch_period_ms": round(1e3 * wall / n, 1),
        "stages": stream.stage_summary(),
        "modes": dict(stream.mode_counts),
        "crop_modes": dict(stream.crop_mode_counts),
        "fused_hits": stream.fused_hits - h0,
        "fused_misses": stream.fused_misses - m0,
        "fallback_batches": stream.fallback_batches - fb0,
        "payload_mb": _mb("payload_mb"),
        "canvas_mb": _mb("canvas_mb"),
        "crops_mb": _mb("crops_mb"),
        "canvas_seg_split": seg_split,
    }, indent=1))


if __name__ == "__main__":
    main()

"""Decompose the fused detect program's device time (roofline analysis).

The bench reports ~10% MFU for "detect" — but that program is conv stack +
DFL decode + class-aware NMS + result packing. This probe times each prefix
of the pipeline separately on the real chip so the MFU story names the
right stage:

  stage A: yolov8 backbone+neck+head forward (the only MXU-heavy part)
  stage B: A + decode_boxes (DFL softmax-expectation + anchor math)
  stage C: B + vmapped NMS + flat pack == the benched "detect" program
  cls:     the 13-way rank classifier on the full crop plane

Per-stage ms/frame, fps, and stage-A achieved TFLOP/s vs the analytic conv
FLOPs (yolov8.flops_per_image, validated against XLA cost_analysis in
tests/test_detector.py) are printed as one JSON object.

MEASUREMENT HONESTY (axon tunnel): ``jax.block_until_ready`` LIES through
the tunnel — it resolves as soon as the remote handle exists, before the
remote compile or execution finished (measured: a batch-64 640px forward
"blocks" in 0.6 ms; >10x the chip's peak FLOP/s). Only fetching a VALUE
truly synchronizes. Every timed program therefore reduces its outputs to a
scalar (data dependence keeps every stage live), and each timing run ends
in one scalar fetch. To cancel the fetch round-trip and any fixed
dispatch overhead, each stage is timed at reps and 2*reps and the SLOPE
(t2 - t1) / reps is the per-execution time. Inputs rotate across three
distinct buffers so no layer of the stack can memoize identical
executions.

Usage:  python tools/roofline_probe.py [--batch 64] [--imgsz 640] [--reps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PEAK_TFLOPS = 197.0  # v5e bf16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.ops import nms as nms_ops

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    det_w = os.path.join(ROOT, "weights", "poker_detector.npz")
    params, meta = load_params(det_w)
    sp = meta.get("spec", {})
    spec = yolov8.build_spec(
        "detect", sp.get("scale", "s"), nc=int(sp.get("nc", 64))
    )
    params = yolov8.fold_params(params, spec)
    B, S = args.batch, args.imgsz

    rng = np.random.default_rng(0)
    xs = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 255, (B, S, S, 3), np.uint8))
            .astype(jnp.float32) / 255.0
        )
        for _ in range(3)
    ]

    def _scalar(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
        )

    def stage_a(p, x):
        return _scalar(yolov8.forward_detect_raw(p, spec, x, cdt))

    def stage_b(p, x):
        raw = yolov8.forward_detect_raw(p, spec, x, cdt)
        return _scalar(yolov8.decode_boxes(raw, (S, S), spec.strides))

    def stage_c(p, x):
        raw = yolov8.forward_detect_raw(p, spec, x, cdt)
        boxes, scores = yolov8.decode_boxes(raw, (S, S), spec.strides)
        det = jax.vmap(
            lambda b, s: nms_ops.nms(
                b, s, conf_thres=0.25, iou_thres=0.45, pre_nms=512,
                max_det=64, use_pallas=True,
            )
        )(boxes, scores)
        return _scalar((det.boxes, det.scores, det.classes.astype(jnp.float32)))

    def bench_fn(fn, p, inputs):
        f = jax.jit(fn)
        float(f(p, inputs[0]))  # warm: compile + execute + true sync

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                out = f(p, inputs[i % len(inputs)])
            float(out)  # one fetch: waits for the whole serial queue
            return time.perf_counter() - t0

        t1, t2 = run(args.reps), run(2 * args.reps)
        return max(t2 - t1, 1e-9) / (args.reps * B)

    res = {"batch": B, "imgsz": S, "dtype": args.dtype}
    a_s = bench_fn(stage_a, params, xs)
    b_s = bench_fn(stage_b, params, xs)
    c_s = bench_fn(stage_c, params, xs)
    fl = yolov8.flops_per_image(spec, S)
    res.update(
        forward_ms=round(1e3 * a_s, 3),
        decode_ms=round(1e3 * (b_s - a_s), 3),
        nms_pack_ms=round(1e3 * (c_s - b_s), 3),
        total_ms=round(1e3 * c_s, 3),
        forward_fps=round(1 / a_s, 1),
        full_fps=round(1 / c_s, 1),
        conv_gflops_per_frame=round(fl / 1e9, 2),
        forward_achieved_tflops=round(fl / a_s / 1e12, 2),
        forward_mfu=round(fl / a_s / PEAK_TFLOPS / 1e12, 4),
    )

    # classifier plane (as the fused steady state runs it: B*8 crops)
    crop_sets = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 255, (B * 8, 64, 64, 3), np.uint8))
            .astype(jnp.float32) / 255.0
        )
        for _ in range(3)
    ]
    cls_w = os.path.join(ROOT, "weights", "rank_classifier_matched.npz")
    cp, _ = load_params(cls_w)
    cspec = yolov8.build_spec("classify", "n", nc=13)
    cp = yolov8.fold_params(cp, cspec)

    def cls_fn(p, c):
        return _scalar(jax.nn.softmax(
            yolov8.forward_classify(p, cspec, c, jnp.float32), axis=-1
        ))

    res["classify_ms_per_frame"] = round(
        1e3 * bench_fn(cls_fn, cp, crop_sets), 3
    )

    # XLA's own view of stage A (per-frame FLOPs cross-check)
    try:
        ca = jax.jit(stage_a).lower(params, xs[0]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        res["xla_gflops_per_frame"] = round(float(ca["flops"]) / B / 1e9, 2)
    except Exception as e:  # cost_analysis is best-effort across backends
        res["xla_gflops_per_frame"] = f"unavailable: {e}"

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

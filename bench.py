"""Benchmark: full fused pipeline frames/sec/chip at 1920x1200 capture.

North-star metric (BASELINE.json): >200 full-pipeline frames/s/chip on TPU
v5e at parity accuracy. The measured program is the complete per-frame stack
the reference runs serially via host round-trips: letterbox -> YOLOv8n
detect -> DFL decode -> class-aware NMS -> on-device rank-crop gather ->
batched 13-way rank classification.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 200.0
SRC_HW = (1200, 1920)
WARMUP = 5
ITERS = 50


def build_pipeline():
    import jax
    import jax.numpy as jnp

    from manual_yolo_tpu.game import taxonomy
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.runtime.pipeline import FusedPipeline

    det_w = os.path.join(os.path.dirname(__file__), "weights", "poker_detector.npz")
    cls_w = os.path.join(
        os.path.dirname(__file__), "weights", "rank_classifier_scratch.npz"
    )

    if os.path.exists(det_w) and os.path.exists(cls_w):
        from manual_yolo_tpu.runtime.shot import load_fused_pipeline

        return load_fused_pipeline(det_w, cls_w, imgsz=640, compute_dtype="bfloat16")

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    return FusedPipeline(
        det_params=det_params,
        det_spec=det_spec,
        cls_params=cls_params,
        cls_spec=cls_spec,
        names=taxonomy.CLASSES,
        rank_names={i: str(i) for i in range(13)},
        imgsz=640,
        compute_dtype=jnp.bfloat16,
    )


def main():
    import jax

    pipe = build_pipeline()
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, SRC_HW + (3,), np.uint8).astype(np.uint8)

    # compile + warmup
    for _ in range(WARMUP):
        res = pipe(frame)
    jax.block_until_ready(res)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        res = pipe(frame)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    fps = ITERS / dt

    print(
        json.dumps(
            {
                "metric": "full_pipeline_fps_per_chip_1920x1200",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

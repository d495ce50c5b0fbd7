"""Detector graph + engine shape/behaviour tests (random weights).

The reference's detector weights (poker_model.pt) are absent from the repo
(SURVEY.md §2a), so graph-level tests run with random init; task-level
parity comes from our own trainer (tests/test_train.py + bench).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.runtime.engine import DetectorEngine  # noqa: E402


@pytest.fixture(scope="module")
def small_engine():
    spec = yolov8.build_spec("detect", "n", nc=64)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    params = yolov8.fold_params(params, spec)
    return DetectorEngine(
        params, spec, names={i: f"c{i}" for i in range(64)}, imgsz=320,
        compute_dtype=jnp.float32,
    )


def test_detect_raw_shapes():
    spec = yolov8.build_spec("detect", "n", nc=64)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 320, 320, 3))
    raw = yolov8.forward_detect_raw(params, spec, x)
    assert len(raw) == 3
    for (box, cls), s in zip(raw, (8, 16, 32)):
        assert box.shape == (1, 320 // s, 320 // s, 64)
        assert cls.shape == (1, 320 // s, 320 // s, 64)


def test_decode_boxes_anchor_count():
    spec = yolov8.build_spec("detect", "n", nc=64)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 320, 320, 3))
    raw = yolov8.forward_detect_raw(params, spec, x)
    boxes, scores = yolov8.decode_boxes(raw, (320, 320), spec.strides)
    A = sum((320 // s) ** 2 for s in (8, 16, 32))
    assert boxes.shape == (1, A, 4)
    assert scores.shape == (1, A, 64)
    assert float(scores.min()) >= 0 and float(scores.max()) <= 1


def test_engine_single_frame(small_engine):
    frame = np.random.randint(0, 255, (240, 400, 3), np.uint8)
    det = jax.device_get(small_engine.detect(frame))
    assert det.boxes.shape == (300, 4)
    n = int(det.count)
    # boxes for valid slots stay inside the source frame
    if n:
        assert det.boxes[:n, 0].min() >= 0 and det.boxes[:n, 2].max() <= 400
        assert det.boxes[:n, 3].max() <= 240


def test_engine_batch(small_engine):
    frames = np.random.randint(0, 255, (2, 240, 400, 3), np.uint8)
    det = jax.device_get(small_engine.detect_batch(frames))
    assert det.boxes.shape == (2, 300, 4)
    assert det.count.shape == (2,)


def test_engine_detect_to_list(small_engine):
    frame = np.random.randint(0, 255, (240, 400, 3), np.uint8)
    out = small_engine.detect_to_list(frame)
    for d in out:
        assert set(d) == {"x1", "y1", "x2", "y2", "conf", "class_id", "class_name"}
        assert 0 <= d["x1"] <= d["x2"] <= 400


def test_flops_per_image_matches_xla_cost_analysis():
    """The analytic FLOPs counter (bench MFU reporting) must agree with
    XLA's own cost model for the compiled forward — conv FLOPs dominate,
    so the two should match within ~10%."""
    import jax.numpy as jnp

    from manual_yolo_tpu.models import yolov8

    for variant, imgsz, nc in (("detect", 160, 64), ("classify", 64, 13)):
        spec = yolov8.build_spec(variant, "n", nc=nc)
        params = yolov8.fold_params(
            yolov8.init_params(jax.random.PRNGKey(0), spec), spec
        )
        fwd = (
            yolov8.forward_detect_raw
            if variant == "detect"
            else yolov8.forward_classify
        )
        fn = jax.jit(lambda p, x: fwd(p, spec, x, jnp.float32))
        lowered = fn.lower(params, jnp.zeros((1, imgsz, imgsz, 3), jnp.float32))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost["flops"])
        ours = yolov8.flops_per_image(spec, imgsz)
        assert 0.85 < ours / xla_flops < 1.15, (variant, ours, xla_flops)

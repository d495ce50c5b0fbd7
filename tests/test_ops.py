"""Letterbox / box-geometry / NMS unit tests against numpy oracles."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.ops import boxes as box_ops  # noqa: E402
from manual_yolo_tpu.ops import nms as nms_ops  # noqa: E402
from manual_yolo_tpu.ops.letterbox import (  # noqa: E402
    letterbox,
    letterbox_params,
    unletterbox_boxes,
)


def test_letterbox_geometry():
    # 930x1130 frame (the reference's SCREEN_REGION, detect.py:18) -> 640
    r, nh, nw, top, left = letterbox_params((1130, 930), (640, 640))
    assert nh == 640 and nw == round(930 * 640 / 1130)
    assert top == 0 and left == (640 - nw) // 2


def test_letterbox_canvas_and_inverse():
    frame = jnp.asarray(np.random.randint(0, 255, (200, 400, 3), np.uint8))
    canvas, r, pad = letterbox(frame, (640, 640))
    assert canvas.shape == (640, 640, 3)
    assert float(canvas.max()) <= 1.0
    # padding rows must be the 114-gray fill
    np.testing.assert_allclose(np.asarray(canvas[0, 0]), 114.0 / 255, atol=1e-6)
    # a box on the canvas maps back into source pixel space
    boxes = jnp.asarray([[pad[1], pad[0], pad[1] + 64 * r, pad[0] + 100 * r]])
    back = np.asarray(unletterbox_boxes(boxes, r, pad, (200, 400)))
    np.testing.assert_allclose(back[0], [0, 0, 64, 100], atol=0.51)


def test_iou_matrix():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    m = np.asarray(box_ops.pairwise_iou(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
    np.testing.assert_allclose(m[0, 1], 25.0 / 175.0, atol=1e-5)


def test_ciou_bounds():
    a = jnp.asarray(np.random.rand(8, 2) * 50)
    wh = jnp.asarray(np.random.rand(8, 2) * 50 + 1)
    boxes = jnp.concatenate([a, a + wh], -1)
    c = np.asarray(box_ops.pairwise_ciou(boxes, boxes))
    np.testing.assert_allclose(np.diag(c), 1.0, atol=1e-4)
    assert (c <= 1.0 + 1e-5).all() and (c >= -1.5).all()


@pytest.mark.parametrize("class_aware", [True, False])
def test_nms_matches_numpy_oracle(class_aware):
    rng = np.random.default_rng(0)
    n = 200
    xy = rng.uniform(0, 600, (n, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.uniform(0, 1, (n, 5)).astype(np.float32) ** 2

    det = nms_ops.nms(
        jnp.asarray(boxes), jnp.asarray(scores), class_aware=class_aware,
        conf_thres=0.25, iou_thres=0.5, pre_nms=256, max_det=256,
    )
    keep = nms_ops.nms_reference_numpy(
        boxes, scores, conf_thres=0.25, iou_thres=0.5, class_aware=class_aware
    )
    det = jax.device_get(det)
    assert int(det.count) == len(keep)
    got = set()
    for i in range(int(det.count)):
        got.add(tuple(np.round(det.boxes[i], 3)))
    want = {tuple(np.round(boxes[i], 3)) for i in keep}
    assert got == want


def test_nms_empty():
    boxes = jnp.zeros((100, 4))
    scores = jnp.zeros((100, 3))
    det = jax.device_get(nms_ops.nms(boxes, scores))
    assert int(det.count) == 0
    assert (det.classes == -1).all()


def test_nms_padding_shape():
    boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.1]], jnp.float32)
    det = jax.device_get(nms_ops.nms(boxes, scores, max_det=300, pre_nms=512))
    assert det.boxes.shape == (300, 4)
    assert int(det.count) == 1
    assert int(det.classes[0]) == 0

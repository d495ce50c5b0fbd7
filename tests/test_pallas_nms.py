"""Pallas NMS kernel vs the jnp greedy implementation (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.ops import nms as nms_ops  # noqa: E402
from manual_yolo_tpu.ops.pallas_nms import pallas_nms_keep  # noqa: E402


def _greedy_keep_numpy(boxes, valid, thres):
    k = len(boxes)
    keep = np.zeros(k, bool)
    for i in range(k):
        if not valid[i]:
            continue
        ok = True
        for j in range(i):
            if not keep[j]:
                continue
            bi, bj = boxes[i], boxes[j]
            x1, y1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            x2, y2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = max(0, bi[2] - bi[0]) * max(0, bi[3] - bi[1])
            b = max(0, bj[2] - bj[0]) * max(0, bj[3] - bj[1])
            if inter / (a + b - inter + 1e-7) > thres:
                ok = False
                break
        keep[i] = ok
    return keep


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 128
    xy = rng.uniform(0, 400, (k, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (k, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1]
    valid = scores > 0.3

    keep_ref = _greedy_keep_numpy(boxes, valid, 0.5)
    keep_pl = np.asarray(
        pallas_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )
    np.testing.assert_array_equal(keep_pl, keep_ref)


def test_pallas_nms_empty():
    boxes = jnp.zeros((64, 4))
    valid = jnp.zeros((64,), bool)
    keep = np.asarray(pallas_nms_keep(boxes, valid, 0.5, interpret=True))
    assert not keep.any()

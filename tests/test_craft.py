"""CRAFT graph shape/postprocess tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import craft  # noqa: E402


def test_forward_shapes():
    params = craft.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 96, 3))
    out = craft.forward(params, x)
    assert out.shape == (1, 32, 48, 2)


def test_text_regions_postprocess():
    cv2 = pytest.importorskip("cv2")
    scores = np.zeros((32, 48, 2), np.float32)
    scores[5:10, 5:20, 0] = 0.9  # one strong text region
    scores[20:24, 30:40, 0] = 0.3  # weak region below text_threshold
    boxes = craft.text_regions_from_scores(scores)
    assert len(boxes) == 1
    x1, y1, x2, y2 = boxes[0]
    assert (x1, y1) == (10, 10) and (x2, y2) == (40, 20)

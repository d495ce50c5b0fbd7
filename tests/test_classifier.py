"""Rank-classifier import + parity tests.

Parity target: the reference's recorded validation metrics
(`runs/rank_classifier/results.csv`: best top-1 0.9403, top-5 0.98507).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.models.classifier import preprocess_crop_host  # noqa: E402


def test_checkpoint_import_shapes(rank_ckpt):
    assert len(rank_ckpt.state) > 100
    assert rank_ckpt.state["model.0.conv.weight"].shape == (16, 3, 3, 3)
    assert rank_ckpt.state["model.9.linear.weight"].shape == (13, 1280)
    assert rank_ckpt.names[9] == "A" and rank_ckpt.names[0] == "10"


def test_classifier_forward_shape(rank_clf):
    x = jnp.zeros((4, 64, 64, 3), jnp.float32)
    logits = rank_clf.logits(x)
    assert logits.shape == (4, 13)
    probs = np.asarray(rank_clf.predict_probs(x))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_classifier_validation_parity(rank_clf, reference_root):
    cv2 = pytest.importorskip("cv2")
    root = os.path.join(reference_root, "rank_classifier", "valid")
    imgs, labels = [], []
    for cname in sorted(os.listdir(root)):
        d = os.path.join(root, cname)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            img = cv2.imread(os.path.join(d, f))
            if img is None:
                continue
            imgs.append(preprocess_crop_host(img))
            labels.append(cname)
    assert len(imgs) == 67
    probs = np.asarray(rank_clf.predict_probs(jnp.asarray(np.stack(imgs))))
    pred = [rank_clf.names[int(i)] for i in probs.argmax(-1)]
    top1 = float(np.mean([p == l for p, l in zip(pred, labels)]))
    # reference best top-1 is 0.9403; require >= parity
    assert top1 >= 0.9402, f"top-1 {top1} below reference parity 0.9403"


def test_random_init_spec_matches_import(rank_ckpt):
    """Randomly-initialised pytree must be congruent with the imported one."""
    spec = yolov8.build_spec("classify", "n", 13)
    imported = yolov8.import_torch_state(rank_ckpt.state, spec, fold=False)
    rand = yolov8.init_params(jax.random.PRNGKey(0), spec)
    assert jax.tree_util.tree_structure(imported) == jax.tree_util.tree_structure(rand)
    s1 = [x.shape for x in jax.tree_util.tree_leaves(imported)]
    s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
    assert s1 == s2


def test_bn_fold_equivalence(rank_ckpt):
    """Folded and unfolded inference must agree up to fp16-origin rounding."""
    spec = yolov8.build_spec("classify", "n", 13)
    p_fold = yolov8.import_torch_state(rank_ckpt.state, spec, fold=True)
    p_bn = yolov8.import_torch_state(rank_ckpt.state, spec, fold=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y1 = yolov8.forward_classify(p_fold, spec, x)
    y2 = yolov8.forward_classify(p_bn, spec, x)
    # checkpoint weights are fp16; folding reorders ~9 stages of rounding
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0.08, rtol=0.0)

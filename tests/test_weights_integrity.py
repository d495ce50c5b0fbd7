"""Committed checkpoint integrity: every shipped .npz loads and matches its spec."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "weights")


def _load(name):
    from manual_yolo_tpu.core.serialization import load_params

    path = os.path.join(WEIGHTS, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    return load_params(path)


@pytest.mark.parametrize("name", ["poker_detector.npz", "poker_detector_n.npz",
                                  "poker_detector_s.npz"])
def test_detector_checkpoints(name):
    from manual_yolo_tpu.models import yolov8

    params, meta = _load(name)
    sp = meta["spec"]
    assert sp["variant"] == "detect" and sp["nc"] == 64
    spec = yolov8.build_spec("detect", sp["scale"], 64)
    folded = yolov8.fold_params(params, spec)
    # congruent with a fresh init of the same spec
    rand = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), spec), spec
    )
    s1 = [x.shape for x in jax.tree_util.tree_leaves(folded)]
    s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
    assert s1 == s2
    assert float(meta["map50"]) > 0.85
    assert len(meta["names"]) == 64
    # weights are finite
    for leaf in jax.tree_util.tree_leaves(folded):
        assert np.isfinite(np.asarray(leaf)).all()


def test_classifier_checkpoint():
    params, meta = _load("rank_classifier_scratch.npz")
    assert meta["spec"]["nc"] == 13
    assert float(meta["top1"]) >= 0.94
    assert sorted(meta["names"].values()) == sorted(
        ["10", "2", "3", "4", "5", "6", "7", "8", "9", "A", "J", "K", "Q"]
    )


def test_matched_classifier_checkpoint():
    """The default classifier: must beat reference parity on BOTH valid
    distributions (folder crops AND fused-pipeline crops)."""
    params, meta = _load("rank_classifier_matched.npz")
    assert meta["spec"]["nc"] == 13
    assert float(meta["top1"]) >= 0.9403  # reference best, BASELINE.md
    assert float(meta["top1_matched"]) >= 0.94
    assert sorted(meta["names"].values()) == sorted(
        ["10", "2", "3", "4", "5", "6", "7", "8", "9", "A", "J", "K", "Q"]
    )


def test_ocr_checkpoint():
    from manual_yolo_tpu.models import crnn

    params, meta = _load("crnn_synth.npz")
    assert int(meta["width"]) in (192, 256)
    # pytree congruent with a fresh init
    rand = crnn.init_params(jax.random.PRNGKey(0), int(meta.get("hidden", 256)))
    s1 = [x.shape for x in jax.tree_util.tree_leaves(params)]
    s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
    assert s1 == s2


def test_ocr_real_checkpoints():
    """The default recognizer ENSEMBLE members: co-trained on synthetic
    renders + labelled real UI crops. Metric floors recorded at train time
    (train/ocr.py)."""
    from manual_yolo_tpu.models import crnn

    for name in ("crnn_real_a.npz", "crnn_real_b.npz"):
        params, meta = _load(name)
        assert int(meta["width"]) in (192, 256)
        assert float(meta["real_holdout"]) >= 0.90, name
        assert float(meta["exact_match"]) >= 0.75, name
        rand = crnn.init_params(jax.random.PRNGKey(0), int(meta.get("hidden", 256)))
        s1 = [x.shape for x in jax.tree_util.tree_leaves(params)]
        s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
        assert s1 == s2, name

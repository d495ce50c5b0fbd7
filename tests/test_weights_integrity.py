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

    for name in ("crnn_real_a.npz", "crnn_real_b.npz", "crnn_h64.npz"):
        params, meta = _load(name)
        assert int(meta["width"]) in (192, 256)
        assert float(meta["real_holdout"]) >= 0.90, name
        assert float(meta["exact_match"]) >= 0.75, name
        rand = crnn.init_params(jax.random.PRNGKey(0), int(meta.get("hidden", 256)))
        s1 = [x.shape for x in jax.tree_util.tree_leaves(params)]
        s2 = [x.shape for x in jax.tree_util.tree_leaves(rand)]
        assert s1 == s2, name
    # the high-resolution member ships kind-gated: 64-px canvas, and it
    # must never compete for numeric fields (leading-digit truncation)
    _, meta = _load("crnn_h64.npz")
    assert int(meta["img_h"]) == 64
    assert set(meta["kinds"].split(",")) == {"game_id", "name"}


def test_torch_numeric_parity_rank_classifier():
    """BASELINE.json's bit-match clause, as far as this environment allows:
    the JAX-imported ``rank_classifier.pt`` forward must numerically match
    an INDEPENDENT torch reconstruction of the ultralytics yolov8n-cls
    graph driven by the raw checkpoint tensors (conv/BN/SiLU semantics per
    ultralytics Conv/C2f/Classify: BatchNorm2d eps=1e-3, C2f chunk(2)
    growing concat, Classify conv->GAP->linear). Same inputs (real valid
    crops), logits within 1e-4 f32."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    ckpt_path = "/root/reference/rank_classifier.pt"
    if not os.path.exists(ckpt_path):
        pytest.skip("reference checkpoint unavailable")
    import glob

    import jax
    import jax.numpy as jnp

    from manual_yolo_tpu.core.weights import load_torch_checkpoint
    from manual_yolo_tpu.models import yolov8

    ck = load_torch_checkpoint(ckpt_path)
    st = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in ck.state.items()}

    def tconv(x, p, stride=1, act=True):
        w = st[p + ".conv.weight"]
        x = F.conv2d(x, w, stride=stride, padding=w.shape[-1] // 2)
        x = F.batch_norm(
            x, st[p + ".bn.running_mean"], st[p + ".bn.running_var"],
            st[p + ".bn.weight"], st[p + ".bn.bias"], eps=1e-3,
        )
        return F.silu(x) if act else x

    def tc2f(x, p, n, shortcut):
        y = tconv(x, p + ".cv1")
        a, b = y.chunk(2, 1)
        outs = [a, b]
        cur = b
        for i in range(n):
            z = tconv(cur, f"{p}.m.{i}.cv1")
            z = tconv(z, f"{p}.m.{i}.cv2")
            cur = cur + z if shortcut else z
            outs.append(cur)
        return tconv(torch.cat(outs, 1), p + ".cv2")

    def torch_forward(x_nchw):
        x = tconv(x_nchw, "model.0", stride=2)
        x = tconv(x, "model.1", stride=2)
        x = tc2f(x, "model.2", 1, True)
        x = tconv(x, "model.3", stride=2)
        x = tc2f(x, "model.4", 2, True)
        x = tconv(x, "model.5", stride=2)
        x = tc2f(x, "model.6", 2, True)
        x = tconv(x, "model.7", stride=2)
        x = tc2f(x, "model.8", 1, True)
        x = tconv(x, "model.9.conv")
        x = x.mean(dim=(2, 3))
        return F.linear(x, st["model.9.linear.weight"],
                        st["model.9.linear.bias"])

    # real crops from the reference valid split, classifier preprocessing
    import cv2

    files = sorted(
        glob.glob("/root/reference/rank_classifier/valid/*/*")
    )[::7][:10]
    assert len(files) >= 8
    imgs = []
    for f in files:
        img = cv2.imread(f)
        assert img is not None, f
        img = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
        imgs.append(img[..., ::-1].astype(np.float32) / 255.0)  # RGB [0,1]
    x = np.stack(imgs)

    spec = yolov8.build_spec("classify", "n", nc=13)
    params = yolov8.import_torch_state(ck.state, spec, fold=True)
    jax_logits = np.asarray(
        yolov8.forward_classify(
            jax.tree_util.tree_map(jnp.asarray, params), spec,
            jnp.asarray(x), jnp.float32,
        )
    )
    with torch.no_grad():
        t_logits = torch_forward(
            torch.tensor(x).permute(0, 3, 1, 2).contiguous()
        ).numpy()
    assert jax_logits.shape == t_logits.shape == (len(files), 13)
    np.testing.assert_allclose(jax_logits, t_logits, rtol=1e-4, atol=1e-4)
    # and the predictions agree with the checkpoint's own class names
    assert (jax_logits.argmax(1) == t_logits.argmax(1)).all()

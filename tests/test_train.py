"""Training-stack unit tests: TAL assignment, detection loss, data pipeline."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.train import data as data_lib  # noqa: E402
from manual_yolo_tpu.train.loss import assign_one, detection_loss  # noqa: E402


def test_assign_one_inside_gt_only():
    A, M, nc = 64, 4, 8
    # anchors on an 8x8 grid, 8px stride
    xs = (np.arange(8) + 0.5) * 8
    gx, gy = np.meshgrid(xs, xs)
    anchor_px = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)

    gt_boxes = jnp.zeros((M, 4)).at[0].set(jnp.asarray([8.0, 8.0, 32.0, 32.0]))
    gt_cls = jnp.zeros((M,), jnp.int32).at[0].set(3)
    gt_mask = jnp.zeros((M,), bool).at[0].set(True)

    # predictions: perfect boxes at the gt for anchors inside it
    pred_boxes = jnp.tile(jnp.asarray([[8.0, 8.0, 32.0, 32.0]]), (A, 1))
    scores = jnp.full((A, nc), 0.5)

    out = assign_one(scores, pred_boxes, anchor_px, gt_cls, gt_boxes, gt_mask, nc)
    fg = np.asarray(out.fg_mask)
    inside = np.asarray(
        (anchor_px[:, 0] > 8) & (anchor_px[:, 0] < 32)
        & (anchor_px[:, 1] > 8) & (anchor_px[:, 1] < 32)
    )
    # every foreground anchor lies inside the gt box
    assert fg.sum() > 0
    assert not np.any(fg & ~inside)
    # assigned class is the gt class with positive normalised score
    ts = np.asarray(out.target_scores)
    assert (ts[fg].argmax(-1) == 3).all()
    assert ts[fg].max() > 0.5  # best-aligned anchor normalises toward max IoU
    # background anchors contribute zero target score
    assert ts[~fg].sum() == 0


def test_assign_one_no_valid_gt():
    A, M, nc = 16, 2, 4
    anchor_px = jnp.asarray(np.random.default_rng(0).uniform(0, 64, (A, 2)), jnp.float32)
    out = assign_one(
        jnp.full((A, nc), 0.5), jnp.zeros((A, 4)), anchor_px,
        jnp.zeros((M,), jnp.int32), jnp.zeros((M, 4)), jnp.zeros((M,), bool), nc,
    )
    assert not np.asarray(out.fg_mask).any()
    assert float(jnp.sum(out.target_scores)) == 0.0


@pytest.mark.slow
def test_detection_loss_and_grad_flow():
    spec = yolov8.build_spec("detect", "n", nc=8)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 96, 96, 3), np.float32))
    t = np.zeros((1, 8, 5), np.float32)
    m = np.zeros((1, 8), bool)
    t[0, 0] = [2, 10, 10, 50, 60]
    m[0, 0] = True
    loss, aux = detection_loss(params, spec, x, jnp.asarray(t), jnp.asarray(m))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert int(aux["num_fg"]) > 0

    g = jax.grad(
        lambda p: detection_loss(p, spec, x, jnp.asarray(t), jnp.asarray(m))[0]
    )(params)
    gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert gsum > 0

    # empty targets: finite loss, zero foreground
    l0, a0 = detection_loss(
        params, spec, x, jnp.zeros((1, 8, 5)), jnp.zeros((1, 8), bool)
    )
    assert np.isfinite(float(l0)) and int(a0["num_fg"]) == 0


def test_uint8_batch_accepted():
    spec = yolov8.build_spec("detect", "n", nc=4)
    params = yolov8.init_params(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)
    )
    loss, _ = detection_loss(
        params, spec, x, jnp.zeros((1, 4, 5)), jnp.zeros((1, 4), bool)
    )
    assert np.isfinite(float(loss))


def test_detect_batch_fixed_shapes():
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(4):
        h, w = int(rng.integers(100, 400)), int(rng.integers(100, 500))
        boxes = np.array([[5, 5, 50, 50]], np.float32)
        samples.append(
            data_lib.DetectSample(
                image=rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.uint8),
                boxes=boxes, classes=np.zeros(1, np.int32),
            )
        )
    x, t, m = data_lib.make_detect_batch(rng, samples, 4, 160, max_boxes=16)
    assert x.shape == (4, 160, 160, 3) and x.dtype == np.uint8
    assert t.shape == (4, 16, 5) and m.shape == (4, 16)
    # boxes that survive augmentation stay inside the canvas
    assert (t[..., 1:][m] >= 0).all() and (t[..., 1:][m] <= 160).all()


def test_eval_batch_letterbox_only():
    rng = np.random.default_rng(1)
    samples = [
        data_lib.DetectSample(
            image=rng.integers(0, 255, (100, 200, 3), np.uint8).astype(np.uint8),
            boxes=np.array([[0, 0, 200, 100]], np.float32),
            classes=np.zeros(1, np.int32),
        )
    ]
    x, t, m, metas = data_lib.make_eval_batch(samples, 128)
    assert x.shape == (1, 128, 128, 3)
    # full-image box letterboxed into the canvas: width spans, height padded
    b = t[0, 0, 1:]
    assert b[0] == 0 and abs(b[2] - 128) < 1
    assert b[1] > 0 and b[3] < 128


def test_ema_update_moves_toward_params():
    from manual_yolo_tpu.train.ema import ema_update

    ema = {"w": jnp.zeros((4,))}
    params = {"w": jnp.ones((4,))}
    out = ema_update(ema, params, jnp.asarray(1000, jnp.int32), decay=0.9, tau=10.0)
    v = float(out["w"][0])
    assert 0.05 < v < 1.0  # moved toward params but not equal


def test_map_metric_perfect_and_miss():
    from manual_yolo_tpu.train.metrics import mean_average_precision

    gts = [{"boxes": np.array([[0, 0, 10, 10]]), "classes": np.array([1])}]
    perfect = [{"boxes": np.array([[0, 0, 10, 10]]), "classes": np.array([1]),
                "scores": np.array([0.9])}]
    res = mean_average_precision(perfect, gts)
    assert res["map50"] > 0.99
    miss = [{"boxes": np.array([[50, 50, 60, 60]]), "classes": np.array([1]),
             "scores": np.array([0.9])}]
    res2 = mean_average_precision(miss, gts)
    assert res2["map50"] < 0.01


def test_detector_trainer_resume(tmp_path):
    """Interrupt a run after 2 epochs, resume to 4: the resumed run starts at
    epoch 3 with optimizer state and best-metric bookkeeping intact."""
    import json

    import cv2

    from manual_yolo_tpu.train.detector import DetTrainConfig, train_detector

    # tiny synthetic YOLO dataset: 4 train / 2 valid images, 2 classes
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("valid", 2)):
        os.makedirs(tmp_path / split / "images", exist_ok=True)
        os.makedirs(tmp_path / split / "labels", exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (64, 64, 3), np.uint8)
            img[16:48, 16:48] = (255, 0, 0)
            cv2.imwrite(str(tmp_path / split / "images" / f"i{i}.jpg"), img)
            (tmp_path / split / "labels" / f"i{i}.txt").write_text(
                f"{i % 2} 0.5 0.5 0.5 0.5\n"
            )
    (tmp_path / "data.yaml").write_text("names: ['a', 'b']\nnc: 2\n")

    out = tmp_path / "runs" / "best.npz"
    base = dict(
        data_root=str(tmp_path), out_path=str(out), batch=2, imgsz=64,
        max_boxes=4, steps_per_epoch=2, eval_every=1, patience=50,
        compute_dtype="float32", close_mosaic=0,
    )
    logs1 = []
    train_detector(DetTrainConfig(epochs=2, **base), log=logs1.append)
    last = tmp_path / "runs" / "last_n.npz"
    assert last.exists()

    logs2 = []
    train_detector(DetTrainConfig(epochs=4, resume=True, **base),
                   log=logs2.append)
    joined = "\n".join(str(l) for l in logs2)
    assert "resumed from" in joined and "epoch 2, step 4" in joined
    assert "epoch 3/4" in joined and "epoch 1/4" not in joined

    # resumed last checkpoint carries the continued counters
    from manual_yolo_tpu.core.serialization import load_params

    _, meta = load_params(str(last))
    assert meta["epoch"] == 4 and meta["step"] == 8

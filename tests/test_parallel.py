"""Sharding tests on the virtual 8-device CPU mesh (SURVEY §2c test strategy)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.parallel import mesh as mesh_lib  # noqa: E402


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (set XLA_FLAGS in conftest)")
    return jax.devices()[:8]


def test_make_mesh_shapes(eight_devices):
    m1 = mesh_lib.make_mesh(8, axes=("data",))
    assert m1.devices.shape == (8,)
    m2 = mesh_lib.make_mesh(8, axes=("data", "spatial"))
    assert m2.devices.size == 8 and len(m2.devices.shape) == 2


def test_sharded_batch_inference_matches_single_device(eight_devices):
    from manual_yolo_tpu.parallel.inference import ShardedDetector
    from manual_yolo_tpu.runtime.engine import DetectorEngine

    spec = yolov8.build_spec("detect", "n", nc=8)
    params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), spec), spec
    )
    mesh = mesh_lib.make_mesh(8, axes=("data",))
    names = {i: f"c{i}" for i in range(8)}
    sharded = ShardedDetector(
        params, spec, mesh, imgsz=64, conf=1e-6, compute_dtype=jnp.float32
    )
    single = DetectorEngine(
        params, spec, names, imgsz=64, conf=1e-6, compute_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 96, 96, 3), np.uint8)
    det_s = jax.device_get(sharded(frames))
    assert det_s.boxes.shape[0] == 8

    # single-device reference over ALL frames: counts, classes, scores and
    # box coordinates must match the sharded path exactly per frame
    det_1 = jax.device_get(single.detect_batch(frames))
    for i in range(8):
        n_s, n_1 = int(det_s.count[i]), int(det_1.count[i])
        assert n_s == n_1, f"frame {i}: count {n_s} != {n_1}"
        np.testing.assert_array_equal(
            det_s.classes[i][:n_s], det_1.classes[i][:n_1], err_msg=f"frame {i}"
        )
        np.testing.assert_allclose(
            det_s.scores[i][:n_s], det_1.scores[i][:n_1], atol=1e-5,
            err_msg=f"frame {i}",
        )
        np.testing.assert_allclose(
            det_s.boxes[i][:n_s], det_1.boxes[i][:n_1], atol=1e-3,
            err_msg=f"frame {i}",
        )


def test_sharded_batch_pads_ragged(eight_devices):
    from manual_yolo_tpu.parallel.inference import ShardedDetector

    spec = yolov8.build_spec("detect", "n", nc=4)
    params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), spec), spec
    )
    mesh = mesh_lib.make_mesh(8, axes=("data",))
    sharded = ShardedDetector(params, spec, mesh, imgsz=64, compute_dtype=jnp.float32)
    frames = np.random.default_rng(0).integers(0, 255, (3, 64, 64, 3), np.uint8)
    det = jax.device_get(sharded(frames))  # 3 -> padded to 8 -> sliced back
    assert det.count.shape == (3,)


def test_tiled_frames_cover_frame():
    from manual_yolo_tpu.parallel.inference import tiled_frames

    frame = np.zeros((1200, 1920, 3), np.uint8)
    tiles, offsets = tiled_frames(frame, tile=640, overlap=0.2)
    assert tiles.shape[1:] == (640, 640, 3)
    xs = {o[0] for o in offsets}
    ys = {o[1] for o in offsets}
    assert max(xs) + 640 >= 1920 and max(ys) + 640 >= 1200
    assert 0 in xs and 0 in ys


def test_dp_train_step_runs_and_is_finite(eight_devices):
    """The multichip dry-run path: one DP train step on the CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_spatial_sharding_forward(eight_devices):
    """Conv forward with activations sharded along H (XLA inserts halos)."""
    mesh = mesh_lib.make_mesh(8, axes=("data", "spatial"))
    spec = yolov8.build_spec("classify", "n", nc=13)
    params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), spec), spec
    )
    # mesh is (data=4, spatial=2) for 8 devices; batch must divide data axis
    x = jnp.asarray(np.random.default_rng(0).random((4, 64, 64, 3), np.float32))
    repl = NamedSharding(mesh, P())
    xsh = NamedSharding(mesh, P("data", "spatial"))
    params = jax.device_put(params, repl)
    x_s = jax.device_put(x, xsh)

    fn = jax.jit(
        lambda p, v: yolov8.forward_classify(p, spec, v),
        in_shardings=(repl, xsh),
        out_shardings=repl,
    )
    out_sharded = np.asarray(fn(params, x_s))
    out_ref = np.asarray(yolov8.forward_classify(params, spec, x))
    np.testing.assert_allclose(out_sharded, out_ref, atol=1e-3, rtol=1e-3)


def test_tp_train_step_matches_dp(eight_devices):
    """Tensor-parallel (channel-sharded weights + optimizer state) step gives
    the same loss as the replicated DP step, and the updated params actually
    come back sharded over the model axis."""
    import optax

    from manual_yolo_tpu.parallel.trainer import (
        channel_shardings,
        make_dp_train_step,
        make_tp_train_step,
    )

    spec = yolov8.build_spec("detect", "n", nc=8)
    params = yolov8.init_params(jax.random.PRNGKey(0), spec)
    ema = jax.tree_util.tree_map(lambda x: x, params)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    B, S, M = 8, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, S, S, 3), np.float32))
    t = np.zeros((B, M, 5), np.float32)
    m = np.zeros((B, M), bool)
    t[:, 0] = [1, 4, 4, 40, 40]
    m[:, 0] = True
    t, m = jnp.asarray(t), jnp.asarray(m)

    mesh1 = mesh_lib.make_mesh(8, axes=("data",))
    dp = make_dp_train_step(spec, tx, mesh1, compute_dtype=jnp.float32)
    repl = NamedSharding(mesh1, P())
    bsh = NamedSharding(mesh1, P("data"))
    p1, e1, o1, loss_dp, _ = dp(
        jax.device_put(params, repl),
        jax.device_put(ema, repl),
        jax.device_put(opt_state, repl),
        jnp.asarray(0, jnp.int32),
        jax.device_put(x, bsh),
        jax.device_put(t, bsh),
        jax.device_put(m, bsh),
    )

    mesh2 = mesh_lib.make_mesh(8, axes=("data", "model"))
    tp, place = make_tp_train_step(spec, tx, mesh2, compute_dtype=jnp.float32)
    p_s, e_s, o_s, x_s, t_s, m_s = place(params, ema, opt_state, x, t, m)
    p2, e2, o2, loss_tp, _ = tp(
        p_s, e_s, o_s, jnp.asarray(0, jnp.int32), x_s, t_s, m_s
    )
    jax.block_until_ready(loss_tp)
    assert np.isfinite(float(loss_tp))
    assert abs(float(loss_tp) - float(loss_dp)) < 1e-2

    # the UPDATED state must match too — the loss alone is computed at the
    # pre-update (identical) params and would not catch a sharding bug in
    # the backward pass, the optax update, or the EMA decay. The comparison
    # runs under SGD, where the update is PROPORTIONAL to the gradient:
    # adamw's step-1 update is ~lr*sign(g), so psum-reduction-order noise
    # on near-zero grads flips signs and produces benign 2*lr diffs that
    # would mask (or false-alarm on) real bugs.
    tx_sgd = optax.sgd(1e-2)
    opt_sgd = tx_sgd.init(params)
    dp_sgd = make_dp_train_step(spec, tx_sgd, mesh1, compute_dtype=jnp.float32)
    p1s, e1s, _, _, _ = dp_sgd(
        jax.device_put(params, repl),
        jax.device_put(ema, repl),
        jax.device_put(opt_sgd, repl),
        jnp.asarray(0, jnp.int32),
        jax.device_put(x, bsh),
        jax.device_put(t, bsh),
        jax.device_put(m, bsh),
    )
    tp_sgd, place_sgd = make_tp_train_step(
        spec, tx_sgd, mesh2, compute_dtype=jnp.float32
    )
    sp, se, so, sx, stt, sm = place_sgd(params, ema, opt_sgd, x, t, m)
    p2s, e2s, _, _, _ = tp_sgd(sp, se, so, jnp.asarray(0, jnp.int32),
                               sx, stt, sm)
    for name, tp_tree, dp_tree in (("params", p2s, p1s), ("ema", e2s, e1s)):
        tl = jax.tree_util.tree_leaves(tp_tree)
        dl = jax.tree_util.tree_leaves(dp_tree)
        assert len(tl) == len(dl)
        worst = 0.0
        for a, b in zip(tl, dl):
            a = np.asarray(jax.device_get(a), np.float32)
            b = np.asarray(jax.device_get(b), np.float32)
            worst = max(worst, float(np.max(np.abs(a - b))))
        assert worst < 1e-5, f"{name} diverged after one step: max|d|={worst}"

    # and a SECOND adamw step from each updated state must agree as well
    # (this exercises the updated optimizer state end-to-end)
    _, _, _, loss_dp2, _ = dp(
        p1, e1, o1, jnp.asarray(1, jnp.int32),
        jax.device_put(x, bsh), jax.device_put(t, bsh), jax.device_put(m, bsh),
    )
    _, _, _, loss_tp2, _ = tp(
        p2, e2, o2, jnp.asarray(1, jnp.int32), x_s, t_s, m_s
    )
    assert abs(float(loss_tp2) - float(loss_dp2)) < 1e-2, (
        float(loss_tp2), float(loss_dp2),
    )

    # stem conv kernel (3,3,3,16): out-channel dim stays sharded over 'model'
    want = channel_shardings(mesh2, params, "model")
    leaf_out = jax.tree_util.tree_leaves(p2)
    leaf_want = jax.tree_util.tree_leaves(want)
    n_sharded = 0
    for lo, lw in zip(leaf_out, leaf_want):
        if lw.spec != P():
            assert lo.sharding.is_equivalent_to(lw, lo.ndim), (
                f"{lo.shape}: {lo.sharding} vs {lw}"
            )
            n_sharded += 1
    assert n_sharded > 100  # the bulk of the 297 leaves really shard

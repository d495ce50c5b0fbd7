"""Data-parallel training step over a device mesh.

Params replicated, batch sharded along ``data``; grads are all-reduced by
XLA (psum inserted automatically from the sharding annotations — no manual
collectives, per the scaling-book recipe). Used by the multi-chip dry run
(`__graft_entry__.dryrun_multichip`) and scales the detector trainer to a
pod slice.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.train.ema import ema_update
from manual_yolo_tpu.train.loss import detection_loss


def _make_step_body(spec, tx, compute_dtype):
    """The (params, ema, opt_state, step, x, t, m) -> ... step function all
    parallel layouts share; only the sharding annotations differ."""

    def step_fn(params, ema_params, opt_state, step, x, t, m):
        def loss_fn(p):
            ctx = yolov8.BNCtx()
            loss, aux = detection_loss(p, spec, x, t, m, compute_dtype, bn_ctx=ctx)
            return loss, (aux, ctx.updates)

        (loss, (aux, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = yolov8.apply_bn_updates(params, bn_updates)
        ema_params = ema_update(ema_params, params, step)
        return params, ema_params, opt_state, loss, aux

    return step_fn


def make_dp_train_step(
    spec: yolov8.ModelSpec,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
    data_axis: str = "data",
    spatial_axis: str = None,
):
    """Returns a jitted (params, ema, opt_state, step, x, t, m) -> ... step
    with batch sharded over ``data_axis`` and state replicated.

    ``spatial_axis`` additionally shards the input's H dimension over that
    mesh axis (2-D data x spatial parallelism): XLA SPMD inserts the conv
    halo exchanges and the loss's cross-shard collectives automatically —
    the spatial analogue of sequence parallelism for large frames."""
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(data_axis))
    xsh = (
        NamedSharding(mesh, P(data_axis, spatial_axis))
        if spatial_axis
        else bsh
    )
    step_fn = _make_step_body(spec, tx, compute_dtype)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, xsh, bsh, bsh),
        out_shardings=(repl, repl, repl, repl, repl),
    )


def channel_shardings(mesh: Mesh, tree, model_axis: str = "model"):
    """Per-leaf NamedShardings that split each array's trailing dimension —
    conv out-channels, BN channel vectors, optimizer moments — over
    ``model_axis``; leaves whose trailing dim doesn't divide (or scalars like
    the optimizer step count) stay replicated. Works on arrays or
    ShapeDtypeStructs, so it can shard real state and ``jax.eval_shape``
    results alike."""
    n = int(mesh.shape[model_axis])
    # only dims that look like real channel axes shard: at least 16 wide
    # (the narrowest conv width in any spec) — otherwise a small
    # non-channel trailing dim (a (B, M, 5) target leaf, a head constant)
    # that happens to divide a larger model axis would get sharded, which
    # is correct under GSPMD but produces surprising layouts/collectives
    MIN_CHANNEL = 16

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        if shape and shape[-1] % n == 0 and shape[-1] >= MIN_CHANNEL:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [model_axis]))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf, tree)


def make_tp_train_step(
    spec: yolov8.ModelSpec,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Tensor-parallel + data-parallel train step over a 2-D mesh.

    Every conv kernel's OUT-CHANNEL dim (and the matching BN vectors,
    gradients, Adam moments and EMA copy) is sharded over ``model_axis`` —
    Megatron-style tensor parallelism for the conv stack that doubles as
    FSDP/ZeRO-style optimizer-state sharding, cutting per-chip state memory
    by the model-axis size. The batch shards over ``data_axis`` as usual.
    XLA GSPMD propagates the channel shardings through forward, backward and
    the optax update, inserting the ICI collectives itself (scaling-book
    recipe; no manual psum). The reference has no distributed training at
    all (SURVEY.md §2c) — this is the TPU-native scaling path.

    Returns ``(step, place)``: ``place(params, ema, opt_state, x, t, m)``
    device_puts each piece with its sharding; ``step`` is jitted with
    EXPLICIT in/out shardings (built from ``channel_shardings`` over the
    first call's shapes), so a caller that skips ``place`` — or passes
    fresh uncommitted arrays after a checkpoint restore — still runs the
    sharded program with outputs in the same layout, and steps chain
    without GSPMD resharding."""
    bsh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    body = _make_step_body(spec, tx, compute_dtype)
    cache: dict = {}

    def step(params, ema_params, opt_state, it, x, t, m):
        if "fn" not in cache:
            psh = channel_shardings(mesh, params, model_axis)
            esh = channel_shardings(mesh, ema_params, model_axis)
            osh = channel_shardings(mesh, opt_state, model_axis)
            cache["fn"] = jax.jit(
                body,
                in_shardings=(psh, esh, osh, repl, bsh, bsh, bsh),
                out_shardings=(psh, esh, osh, repl, repl),
            )
        return cache["fn"](params, ema_params, opt_state, it, x, t, m)

    def place(params, ema_params, opt_state, x, t, m):
        psh = channel_shardings(mesh, params, model_axis)
        put = jax.device_put
        return (
            put(params, psh),
            put(ema_params, channel_shardings(mesh, ema_params, model_axis)),
            put(opt_state, channel_shardings(mesh, opt_state, model_axis)),
            put(x, bsh),
            put(t, bsh),
            put(m, bsh),
        )

    return step, place

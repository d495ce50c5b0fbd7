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

    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, xsh, bsh, bsh),
        out_shardings=(repl, repl, repl, repl, repl),
    )

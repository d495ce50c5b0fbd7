"""Exponential moving average of params (ultralytics-style ramped decay).

The reference's checkpoints carry an ``ema`` copy (we import it in
core/weights.py); this reproduces the behaviour for our own trainer:
decay(t) = d * (1 - exp(-t / tau)), applied as a pytree map — runs fully
on device inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step: jnp.ndarray, decay: float = 0.9999, tau: float = 2000.0):
    d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )

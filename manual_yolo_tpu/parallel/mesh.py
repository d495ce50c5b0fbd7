"""Device-mesh construction and sharding helpers.

The reference has NO distributed support (SURVEY.md §2c); the TPU framework
adds first-class scaling: a ``jax.sharding.Mesh`` with a ``data`` axis for
frame/batch parallelism (ICI all-reduce for gradients) and a ``spatial``
axis for sharding large frames across chips (XLA SPMD inserts conv halo
exchanges automatically — the spatial analogue of sequence parallelism for
this workload, cf. SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            # favour the data axis; spatial/model axis gets the remainder
            d = _largest_divisor_leq(n, int(np.sqrt(n)))
            shape = (n // d, d)
        else:
            raise ValueError("provide an explicit shape for >2 axes")
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    return Mesh(np.asarray(devs).reshape(shape), axes)


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(max(k, 1), 0, -1):
        if n % d == 0:
            return d
    return 1


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """Shard (B, H, W, C) activations along H. XLA SPMD handles conv halos."""
    return NamedSharding(mesh, P(None, axis))


def shard_params(mesh: Mesh, params):
    """Replicate a params pytree across the mesh."""
    s = replicated(mesh)
    return jax.device_put(params, s)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    s = batch_sharding(mesh, axis)
    return jax.device_put(batch, s)

"""Pallas TPU kernel for greedy NMS (BASELINE.json / SURVEY.md §2b deliverable).

Replaces the torchvision CUDA NMS the reference consumes inside ultralytics
postprocess. One kernel fuses the pairwise-IoU computation with the
sequential greedy keep-scan:

  * boxes live in VMEM as ONE (8, K) plane — rows x1,y1,x2,y2,valid
    (sublane-padded to the f32 tile, lane = K);
  * the scan is a ``fori_loop`` whose trip count is the number of
    confidence-valid candidates (candidates arrive score-descending from
    the caller's top_k, so the valid ones are a prefix) — a table frame
    has ~30-60 valid boxes of the 512 pre-NMS slots, cutting the
    sequential scan ~10x vs a fixed K-trip loop;
  * each step extracts the candidate's 5 values in ONE masked-max
    reduction over the (5, K) plane, computes IoU against ALL boxes in one
    VPU vector op, and tests it against the running keep mask — no K x K
    matrix is ever materialised;
  * class separation uses the coordinate-offset trick (same math as
    ops/nms.py), so one kernel serves class-aware and class-agnostic modes.

The public entry ``pallas_nms_keep`` returns the keep mask; ``ops.nms.nms``
uses it on TPU (fallback to the jnp path elsewhere / under interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(plane_ref, scalars_ref, keep_ref, *, k: int):
    """plane (8, K): rows 0-3 = x1,y1,x2,y2, row 4 = valid, rows 5-7 dead
    (f32 sublane tile). scalars (1, 2) SMEM = [iou_thres, n_valid].
    keep (8, K); only row 0 carries data."""
    x1 = plane_ref[0:1, :]  # (1, K)
    y1 = plane_ref[1:2, :]
    x2 = plane_ref[2:3, :]
    y2 = plane_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    thres = scalars_ref[0, 0]
    n_valid = scalars_ref[0, 1].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (5, k), 1)

    keep_ref[...] = jnp.zeros_like(keep_ref)

    def body(i, _):
        # candidate i's x1,y1,x2,y2,valid in ONE masked-max reduction
        # (Mosaic forbids scalar VMEM indexing; (5,1) keeps it vectorised)
        cand = jnp.max(
            jnp.where(lane == i, plane_ref[0:5, :], -jnp.inf),
            axis=1, keepdims=True,
        )  # (5, 1)
        bx1, by1 = cand[0:1, :], cand[1:2, :]
        bx2, by2 = cand[2:3, :], cand[3:4, :]
        bval = cand[4:5, :]
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        # IoU of candidate i vs all boxes — one vector op across K lanes
        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / (area + barea - inter + 1e-7)  # (1, K)

        kept = keep_ref[0:1, :]  # (1, K) — higher-scored keeps so far
        overlaps_kept = jnp.any((iou > thres) & (kept > 0.5))
        keep_i = jnp.where((bval[0, 0] > 0.5) & ~overlaps_kept, 1.0, 0.0)
        # masked vector store: only lane i changes
        keep_ref[0:1, :] = jnp.where(lane[0:1, :] == i, keep_i, kept)
        return 0

    # dynamic trip count: candidates are score-descending, so lanes past
    # n_valid are all invalid and keep their zero-init — no work needed
    jax.lax.fori_loop(0, n_valid, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_nms_keep(
    boxes: jnp.ndarray,  # (K, 4) xyxy, score-descending, class offsets applied
    valid: jnp.ndarray,  # (K,) bool
    iou_thres: float | jnp.ndarray = 0.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask (K,) bool via the Pallas kernel."""
    k = boxes.shape[0]
    plane = jnp.zeros((8, k), jnp.float32)
    plane = plane.at[0:4, :].set(boxes.T.astype(jnp.float32))
    plane = plane.at[4, :].set(valid.astype(jnp.float32))
    # valid is a prefix of the score-sorted candidates -> its sum bounds
    # the greedy scan's trip count
    n_valid = jnp.sum(valid.astype(jnp.float32))
    scalars = jnp.stack(
        [jnp.asarray(iou_thres, jnp.float32), n_valid]
    ).reshape(1, 2)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((8, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plane, scalars)
    return keep[0] > 0.5


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic compile path)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False

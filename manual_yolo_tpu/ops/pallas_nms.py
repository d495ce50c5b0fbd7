"""Pallas TPU kernel for greedy NMS (BASELINE.json / SURVEY.md §2b deliverable).

Replaces the torchvision CUDA NMS the reference consumes inside ultralytics
postprocess. One kernel fuses the pairwise-IoU computation with the
sequential greedy keep-scan:

  * boxes live in VMEM as four (8, K) planes (sublane-padded, lane=K);
  * the scan is a ``fori_loop`` over candidates (score-descending order is
    established by the caller's top_k); each step computes IoU of candidate
    i against ALL boxes in one VPU vector op and tests it against the
    running keep mask — no K x K matrix is ever materialised;
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


def _nms_kernel(boxes_ref, valid_ref, thres_ref, keep_ref, *, k: int):
    """boxes (4, 8, K) planes [x1,y1,x2,y2]; valid (8, K); keep (8, K).

    Only row 0 of the 8-sublane padding carries data; the rest is dead
    lanes kept for TPU tiling.
    """
    x1 = boxes_ref[0, 0:1, :]  # (1, K)
    y1 = boxes_ref[1, 0:1, :]
    x2 = boxes_ref[2, 0:1, :]
    y2 = boxes_ref[3, 0:1, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    thres = thres_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    keep_ref[...] = jnp.zeros_like(keep_ref)

    def body(i, _):
        # candidate i's coordinates: one-lane dynamic reductions (Mosaic
        # forbids scalar VMEM stores; scalar extraction via masked max)
        sel = lane == i
        bx1 = jnp.max(jnp.where(sel, x1, -jnp.inf))
        by1 = jnp.max(jnp.where(sel, y1, -jnp.inf))
        bx2 = jnp.max(jnp.where(sel, x2, -jnp.inf))
        by2 = jnp.max(jnp.where(sel, y2, -jnp.inf))
        bval = jnp.max(jnp.where(sel, valid_ref[0:1, :], 0.0))
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
        keep_i = jnp.where((bval > 0.5) & ~overlaps_kept, 1.0, 0.0)
        # masked vector store: only lane i changes
        keep_ref[0:1, :] = jnp.where(sel, keep_i, kept)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_nms_keep(
    boxes: jnp.ndarray,  # (K, 4) xyxy, score-descending, class offsets applied
    valid: jnp.ndarray,  # (K,) bool
    iou_thres: float | jnp.ndarray = 0.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask (K,) bool via the Pallas kernel."""
    k = boxes.shape[0]
    planes = jnp.zeros((4, 8, k), jnp.float32)
    planes = planes.at[:, 0, :].set(boxes.T.astype(jnp.float32))
    vmask = jnp.zeros((8, k), jnp.float32).at[0].set(valid.astype(jnp.float32))
    thres = jnp.full((1, 1), iou_thres, jnp.float32)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((8, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes, vmask, thres)
    return keep[0] > 0.5


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic compile path)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False

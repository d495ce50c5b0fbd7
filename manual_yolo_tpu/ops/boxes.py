"""Box geometry ops (pure jnp, shared by NMS, assigner, tracker math)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """IoU matrix between (N,4) and (M,4) xyxy boxes -> (N,M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / (union + eps)


def pairwise_ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete-IoU between (N,4) and (M,4) xyxy boxes -> (N,M).

    Used by the detector training loss (the reference's vendored trainer uses
    CIoU box loss); formulated to be stable under jit/grad.
    """
    iou = pairwise_iou(a, b, eps)
    # enclosing box diagonal
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    cwh = jnp.maximum(rb - lt, 0.0)
    c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + eps
    # center distance
    ac = (a[:, :2] + a[:, 2:]) / 2
    bc = (b[:, :2] + b[:, 2:]) / 2
    d2 = jnp.sum((ac[:, None] - bc[None, :]) ** 2, -1)
    # aspect-ratio term
    aw = jnp.maximum(a[:, 2] - a[:, 0], eps)[:, None]
    ah = jnp.maximum(a[:, 3] - a[:, 1], eps)[:, None]
    bw = jnp.maximum(b[:, 2] - b[:, 0], eps)[None, :]
    bh = jnp.maximum(b[:, 3] - b[:, 1], eps)[None, :]
    v = (4 / jnp.pi**2) * (jnp.arctan(bw / bh) - jnp.arctan(aw / ah)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
    return iou - d2 / c2 - alpha * v


def elementwise_ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """CIoU between matched box pairs: (..., 4) x (..., 4) -> (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / (union + eps)
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    cwh = jnp.maximum(erb - elt, 0.0)
    c2 = cwh[..., 0] ** 2 + cwh[..., 1] ** 2 + eps
    ac = (a[..., :2] + a[..., 2:]) / 2
    bc = (b[..., :2] + b[..., 2:]) / 2
    d2 = jnp.sum((ac - bc) ** 2, -1)
    aw = jnp.maximum(a[..., 2] - a[..., 0], eps)
    ah = jnp.maximum(a[..., 3] - a[..., 1], eps)
    bw = jnp.maximum(b[..., 2] - b[..., 0], eps)
    bh = jnp.maximum(b[..., 3] - b[..., 1], eps)
    v = (4 / jnp.pi**2) * (jnp.arctan(bw / bh) - jnp.arctan(aw / ah)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
    return iou - d2 / c2 - alpha * v


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)

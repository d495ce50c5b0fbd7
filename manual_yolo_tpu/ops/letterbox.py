"""Letterbox preprocessing on device.

Re-implements the semantics of ultralytics' LetterBox preprocess consumed by
the reference at every ``model(frame)`` call (reference ``detect.py:541``,
``pipe.py:179``, ``yolo.py:361``): scale with preserved aspect ratio
(r = min(H_t/h, W_t/w), no upscaling beyond 1.0 for val-style calls, center
padding with gray 114).

TPU-first differences:
  * runs under jit on-device (uint8 HBM frame -> normalized float canvas),
    fused by XLA into the first conv's input pipeline;
  * static target shape — the live pipeline feeds fixed-size frames, so no
    recompiles;
  * resize is ``jax.image.resize`` bilinear (matches cv2.INTER_LINEAR up to
    boundary rounding).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0


def letterbox_params(
    src_hw: Tuple[int, int], dst_hw: Tuple[int, int], scaleup: bool = True
) -> Tuple[float, int, int, int, int]:
    """Static letterbox geometry: (ratio, new_h, new_w, pad_top, pad_left)."""
    h, w = src_hw
    H, W = dst_hw
    r = min(H / h, W / w)
    if not scaleup:
        r = min(r, 1.0)
    new_h, new_w = round(h * r), round(w * r)
    pad_h, pad_w = H - new_h, W - new_w
    # center padding, matching the reference's letterbox (dw/2, dh/2 rounding)
    top = int(round(pad_h / 2 - 0.1))
    left = int(round(pad_w / 2 - 0.1))
    return r, new_h, new_w, top, left


def letterbox(
    frame: jnp.ndarray,
    dst_hw: Tuple[int, int],
    scaleup: bool = True,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """Letterbox a (H, W, 3) uint8/float frame to (H_t, W_t, 3) in [0,1].

    Returns (canvas, ratio, (pad_top, pad_left)); ratio/pads are static
    Python values usable for inverse box mapping without device sync.
    """
    h, w = frame.shape[0], frame.shape[1]
    H, W = dst_hw
    r, new_h, new_w, top, left = letterbox_params((h, w), (H, W), scaleup)
    img = frame.astype(dtype)
    if (new_h, new_w) != (h, w):
        # antialias=False matches cv2.INTER_LINEAR (the reference's and the
        # training pipeline's letterbox); the antialiased default diverges
        # by ~28 gray levels mean when downscaling
        img = jax.image.resize(img, (new_h, new_w, 3), method="bilinear",
                               antialias=False)
    canvas = jnp.full((H, W, 3), PAD_VALUE, dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, img, (top, left, 0))
    return canvas / 255.0, r, (top, left)


def unletterbox_boxes(
    boxes_xyxy: jnp.ndarray, ratio: float, pad: Tuple[int, int], src_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Map boxes from letterbox-canvas pixels back to source-frame pixels."""
    top, left = pad
    h, w = src_hw
    shift = jnp.array([left, top, left, top], boxes_xyxy.dtype)
    out = (boxes_xyxy - shift) / ratio
    lim = jnp.array([w, h, w, h], out.dtype)
    return jnp.clip(out, 0.0, lim)


def bgr_to_rgb(frame: jnp.ndarray) -> jnp.ndarray:
    return frame[..., ::-1]

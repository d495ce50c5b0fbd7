"""On-device image ops (pure jnp) replacing the reference's OpenCV calls.

The reference's OCR preprocessing is host OpenCV (SURVEY.md §2b): cvtColor,
CLAHE, GaussianBlur, filter2D sharpen, adaptive/Otsu threshold, morphology
(``detect.py:149-178``, ``pipe.py:74-98``, ``yolo.py:192-216``). Each of
these is re-implemented as a jit-compatible function so the OCR multi-pass
cascade runs entirely on device, batched.

All functions take/return float images in [0,1]; histogram-based ops
(CLAHE, Otsu) use 256-bin quantisation exactly like their uint8 originals.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BINS = 256


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB -> (...) luma, matching cv2's BGR2GRAY coefficients."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _hist256(x: jnp.ndarray) -> jnp.ndarray:
    """Histogram of a [0,1] image over 256 bins (differentiability not needed)."""
    q = jnp.clip((x * (BINS - 1)).astype(jnp.int32), 0, BINS - 1)
    return jnp.zeros((BINS,), jnp.float32).at[q.reshape(-1)].add(1.0)


def otsu_threshold(gray: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold value in [0,1] (cv2.THRESH_OTSU equivalent)."""
    hist = _hist256(gray)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    omega = jnp.cumsum(p)
    levels = jnp.arange(BINS, dtype=jnp.float32)
    mu = jnp.cumsum(p * levels)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-9, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-9), 0.0)
    t = jnp.argmax(sigma_b).astype(jnp.float32)
    return t / (BINS - 1)


def otsu_binarize(gray: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    t = otsu_threshold(gray)
    out = (gray > t).astype(gray.dtype)
    return 1.0 - out if inverse else out


_CV2_FIXED_KERNELS = {
    1: (1.0,),
    3: (0.25, 0.5, 0.25),
    5: (0.0625, 0.25, 0.375, 0.25, 0.0625),
    7: (0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125),
}


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    if sigma <= 0:
        # cv2.getGaussianKernel uses fixed binomial-ish kernels for small
        # sizes when sigma<=0 — match them exactly for parity
        if ksize in _CV2_FIXED_KERNELS:
            return jnp.asarray(_CV2_FIXED_KERNELS[ksize], jnp.float32)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv2 default rule
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    return k / jnp.sum(k)


def _sep_conv(gray: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filter on (H, W) with edge replication."""
    k = k1d.shape[0]
    pad = k // 2
    x = gray[None, :, :, None]
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kv = k1d.reshape(k, 1, 1, 1)
    kh = k1d.reshape(1, k, 1, 1)
    y = jax.lax.conv_general_dilated(
        x, kv, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[0, :, :, 0]


def gaussian_blur(gray: jnp.ndarray, ksize: int = 3, sigma: float = 0.0) -> jnp.ndarray:
    return _sep_conv(gray, gaussian_kernel1d(ksize, sigma))


def sharpen(gray: jnp.ndarray) -> jnp.ndarray:
    """The reference's 3x3 sharpen kernel [[-1..],[-1,9,-1],[-1..]]
    (detect.py:166, yolo.py:200): 9*x - 8*boxblur contribution."""
    k = jnp.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]], jnp.float32)
    x = jnp.pad(gray[None, :, :, None], ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        x, k.reshape(3, 3, 1, 1), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.clip(y[0, :, :, 0], 0.0, 1.0)


def adaptive_threshold_gaussian(
    gray: jnp.ndarray, block: int = 11, c: float = 2.0 / 255.0
) -> jnp.ndarray:
    """cv2.adaptiveThreshold(GAUSSIAN_C, BINARY, block, C) equivalent."""
    local = _sep_conv(gray, gaussian_kernel1d(block))
    return (gray > local - c).astype(gray.dtype)


def _window_minmax(gray: jnp.ndarray, k: int, op, pad_value: float) -> jnp.ndarray:
    init = jnp.inf if op is jax.lax.min else -jnp.inf
    lo, hi = k // 2, (k - 1) // 2  # asymmetric for even kernels (cv2 anchor)
    x = jnp.pad(gray, ((lo, hi), (lo, hi)), constant_values=pad_value)
    return jax.lax.reduce_window(x, init, op, (k, k), (1, 1), "VALID")


def erode(gray: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    # cv2 erode border default acts as +inf: borders never erode inward
    return _window_minmax(gray, k, jax.lax.min, 1.0)


def dilate(gray: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    return _window_minmax(gray, k, jax.lax.max, 0.0)


def morph_open(gray: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    return dilate(erode(gray, k), k)


def morph_close(gray: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    return erode(dilate(gray, k), k)


def clahe(
    gray: jnp.ndarray,
    clip_limit: float = 3.0,
    tiles: Tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalisation (cv2.createCLAHE).

    Per-tile clipped-histogram CDF mappings with bilinear interpolation
    between tile centers — the exact CLAHE algorithm, expressed as dense
    tensor math: (tiles) one-hot histograms + a gather of 4 neighbouring
    tile mappings per pixel.
    """
    H, W = gray.shape
    ty, tx = tiles
    th, tw = -(-H // ty), -(-W // tx)  # ceil tile size
    padded = jnp.pad(gray, ((0, ty * th - H), (0, tx * tw - W)), mode="edge")
    q = jnp.clip((padded * (BINS - 1)).astype(jnp.int32), 0, BINS - 1)
    tiles_q = q.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)

    hists = jax.vmap(
        lambda t: jnp.zeros((BINS,), jnp.float32).at[t].add(1.0)
    )(tiles_q)  # (T, BINS)

    # clip histogram and redistribute excess uniformly (OpenCV semantics)
    npix = th * tw
    limit = jnp.maximum(clip_limit * npix / BINS, 1.0)
    clipped = jnp.minimum(hists, limit)
    excess = jnp.sum(hists - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / BINS
    cdf = jnp.cumsum(clipped, axis=1)
    cdf_min = cdf[:, :1]
    denom = jnp.maximum(npix - cdf_min, 1.0)
    mapping = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)  # (T, BINS) -> [0,1]
    mapping = mapping.reshape(ty, tx, BINS)

    # bilinear interpolation between the 4 surrounding tile mappings
    ys = (jnp.arange(H, dtype=jnp.float32) - th / 2 + 0.5) / th
    xs = (jnp.arange(W, dtype=jnp.float32) - tw / 2 + 0.5) / tw
    y0 = jnp.clip(jnp.floor(ys), 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, tx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, ty - 1)
    x1 = jnp.clip(x0 + 1, 0, tx - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]

    qq = jnp.clip((gray * (BINS - 1)).astype(jnp.int32), 0, BINS - 1)
    m00 = mapping[y0[:, None], x0[None, :], qq]
    m01 = mapping[y0[:, None], x1[None, :], qq]
    m10 = mapping[y1[:, None], x0[None, :], qq]
    m11 = mapping[y1[:, None], x1[None, :], qq]
    top = m00 * (1 - fx) + m01 * fx
    bot = m10 * (1 - fx) + m11 * fx
    return top * (1 - fy) + bot * fy


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    shape = out_hw + img.shape[2:] if img.ndim > 2 else out_hw
    return jax.image.resize(img, shape, method="bilinear")


def _cubic_resize_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """(n_out, n_in) interpolation matrix for one axis of cv2.INTER_CUBIC:
    Keys bicubic kernel with a = -0.75 (OpenCV's constant; jax.image's
    'cubic' uses a = -0.5 and does NOT match), half-pixel-centered source
    coordinates, replicate-clamped borders. Shapes are static under jit so
    the matrix is a compile-time constant."""
    import numpy as np

    a = -0.75
    x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    ix = np.floor(x).astype(np.int64)
    f = x - ix  # in [0, 1)
    # tap offsets -1..2 around ix; Keys weights as cv2's interpolateCubic
    t = np.stack([1.0 + f, f, 1.0 - f, 2.0 - f])  # |distance| per tap
    w = np.where(
        t <= 1.0,
        ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a,
    )  # (4, n_out); rows already sum to 1
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(4):
        cols = np.clip(ix + (k - 1), 0, n_in - 1)
        np.add.at(mat, (np.arange(n_out), cols), w[k])
    return mat.astype(np.float32)


def resize_cubic(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(..., INTER_CUBIC) parity on device (reference OCR pass 3
    upscale, detect.py:215-221, and the card chain detect.py:160-171).

    Separable: out = Wy @ img @ Wx.T — two dense matmuls that land on the
    MXU, with the (static-shape) weight matrices folded in at compile
    time. Intended for crop-sized images; no range clamp (cv2 float
    resize does not clamp either)."""
    wy = jnp.asarray(_cubic_resize_matrix(img.shape[0], out_hw[0]))
    wx = jnp.asarray(_cubic_resize_matrix(img.shape[1], out_hw[1]))
    if img.ndim == 2:
        return wy @ img @ wx.T
    # (H, W, C) -> contract H then W, keep channels last
    tmp = jnp.einsum("oh,hwc->owc", wy, img)
    return jnp.einsum("pw,owc->opc", wx, tmp)


def enhance_for_ocr_standard(gray: jnp.ndarray) -> jnp.ndarray:
    """'standard' enhancement (reference detect.py:172-175): CLAHE clip=2."""
    return clahe(gray, clip_limit=2.0)


def enhance_for_ocr_card(gray: jnp.ndarray, upscale: int = 3) -> jnp.ndarray:
    """'card_rank' enhancement chain (reference detect.py:160-171):
    3x cubic upscale -> CLAHE(3) -> denoise -> sharpen -> adaptive thresh ->
    morph close. Denoise is a gaussian blur stand-in for fastNlMeans
    (SURVEY hard-part (e): justified simpler substitute, parity-gated)."""
    h, w = gray.shape
    up = jnp.clip(resize_cubic(gray, (h * upscale, w * upscale)), 0.0, 1.0)
    x = clahe(up, clip_limit=3.0)
    x = gaussian_blur(x, 3)
    x = sharpen(x)
    x = adaptive_threshold_gaussian(x, 11)
    return morph_close(x, 2)


def estimate_skew_angle(gray: jnp.ndarray, max_deg: float = 15.0) -> jnp.ndarray:
    """Estimate text-line skew (radians) from the second moments of the
    ink mask — the XLA-friendly equivalent of the reference's
    ``cv2.minAreaRect`` deskew angle (``pipe.py:249-261``): the principal
    axis of an unskewed text line is horizontal, so the axis tilt IS the
    skew. Clamped to ±``max_deg`` degrees; near-empty masks return 0."""
    thr = otsu_threshold(gray)
    # ink = darker-than-threshold by default; pick the minority side so
    # light-on-dark UIs work too
    dark = (gray < thr).astype(jnp.float32)
    mask = jnp.where(jnp.mean(dark) <= 0.5, dark, 1.0 - dark)
    h, w = gray.shape
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    m = jnp.sum(mask) + 1e-6
    cy = jnp.sum(mask * ys) / m
    cx = jnp.sum(mask * xs) / m
    mu20 = jnp.sum(mask * (xs - cx) ** 2) / m
    mu02 = jnp.sum(mask * (ys - cy) ** 2) / m
    mu11 = jnp.sum(mask * (xs - cx) * (ys - cy)) / m
    ang = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02 + 1e-9)
    lim = jnp.deg2rad(max_deg)
    ang = jnp.clip(ang, -lim, lim)
    # too little ink -> unreliable estimate -> no-op
    return jnp.where(m > 8.0, ang, 0.0)


def rotate_bilinear(gray: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate by ``angle`` radians about the center (bilinear, edge-clamped)
    — the ``cv2.warpAffine`` step of the reference deskew."""
    h, w = gray.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    c, s = jnp.cos(angle), jnp.sin(angle)
    sx = jnp.clip(cx + c * xs - s * ys, 0.0, w - 1.0)
    sy = jnp.clip(cy + s * xs + c * ys, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0
    g = gray.astype(jnp.float32)
    top = g[y0, x0] * (1 - fx) + g[y0, x1] * fx
    bot = g[y1, x0] * (1 - fx) + g[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def deskew(gray: jnp.ndarray, max_deg: float = 15.0) -> jnp.ndarray:
    """Moment-based deskew: estimate the skew angle and rotate it out
    (reference ``pipe.py:249-261`` minAreaRect -> warpAffine chain).
    ``rotate_bilinear`` inverse-maps, so sampling with the estimated angle
    itself applies the corrective rotation."""
    return rotate_bilinear(gray, estimate_skew_angle(gray, max_deg))

"""CRAFT text detector (region/affinity heatmaps) in pure JAX.

Completes the EasyOCR-replacement inventory (SURVEY.md §2b): EasyOCR =
CRAFT detector + CRNN recognizer. In this framework the YOLO detector
already localises every text field, so CRAFT is OPTIONAL — it serves the
general-OCR path (finding text lines inside arbitrary crops). Architecture
follows the published CRAFT design (VGG16-BN feature extractor, U-Net-style
double-conv upsampling to stride 2, 2-channel head: region + affinity);
weights can be imported from a ``craft_mlt_25k.pth`` checkpoint when one is
available (none ships with the reference, and this environment has no
egress), or trained with train-mode BN via the same BNCtx mechanism as the
YOLO graphs.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torchvision VGG BN default

# VGG16-BN conv plan: (out_channels, pool_before)
_VGG_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]


def _init_conv(key, cin, cout, k=3, with_bn=True):
    bound = math.sqrt(6.0 / (cin * k * k))
    p = {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)}
    if with_bn:
        p["bn"] = {
            "gamma": jnp.ones((cout,)), "beta": jnp.zeros((cout,)),
            "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,)),
        }
    else:
        p["b"] = jnp.zeros((cout,))
    return p


def init_params(key) -> Dict:
    ks = iter(jax.random.split(key, 64))
    vgg = []
    cin = 3
    for cout, _ in _VGG_PLAN:
        vgg.append(_init_conv(next(ks), cin, cout))
        cin = cout
    # stride-16 extension (fc6/fc7-style dilated convs)
    ext = [
        _init_conv(next(ks), 512, 1024, 3),
        _init_conv(next(ks), 1024, 1024, 1),
    ]

    def upconv(cin, cmid, cout):
        return {
            "c1": _init_conv(next(ks), cin, cmid, 1),
            "c2": _init_conv(next(ks), cmid, cout, 3),
        }

    ups = [
        upconv(1024 + 512, 512, 256),
        upconv(256 + 512, 256, 128),
        upconv(128 + 256, 128, 64),
        upconv(64 + 128, 64, 32),
    ]
    head = [
        _init_conv(next(ks), 32, 32, 3),
        _init_conv(next(ks), 32, 32, 3),
        _init_conv(next(ks), 32, 16, 3),
        _init_conv(next(ks), 16, 16, 1),
        _init_conv(next(ks), 16, 2, 1, with_bn=False),
    ]
    return {"vgg": vgg, "ext": ext, "ups": ups, "head": head}


BN_MOMENTUM = 0.1  # torchvision BatchNorm2d default


class BNCtx:
    """Train-mode BN statistics collector (same scheme as yolov8.BNCtx)."""

    def __init__(self, momentum: float = BN_MOMENTUM):
        self.momentum = momentum
        self.updates: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}


def _conv(p, x, k_stride=1, dilation=1, act=True, compute_dtype=jnp.float32,
          bn_ctx=None, path=""):
    k = p["w"].shape[0]
    pad = ((k - 1) * dilation) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        (k_stride, k_stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    y = y.astype(jnp.float32)
    if "bn" in p:
        bn = p["bn"]
        if bn_ctx is not None:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
            m = bn_ctx.momentum
            bn_ctx.updates[path] = (
                (1 - m) * bn["mean"] + m * mean,
                (1 - m) * bn["var"] + m * var,
            )
        else:
            mean, var = bn["mean"], bn["var"]
        y = (y - mean) * (bn["gamma"] * jax.lax.rsqrt(var + BN_EPS)) + bn["beta"]
    elif "b" in p:
        y = y + p["b"]
    return jax.nn.relu(y) if act else y


def apply_bn_updates(params, updates: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]):
    """Splice BNCtx-collected running stats back into the params pytree."""

    def rec(p, path):
        if isinstance(p, dict):
            if "w" in p and "bn" in p and path in updates:
                mean, var = updates[path]
                return dict(p, bn=dict(p["bn"], mean=mean, var=var))
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in p.items()}
        if isinstance(p, list):
            return [rec(v, f"{path}.{i}") for i, v in enumerate(p)]
        return p

    return rec(params, "")


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )


def _resize_to(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]), "bilinear")


def forward(params, x, compute_dtype=jnp.float32, bn_ctx=None) -> jnp.ndarray:
    """x: (N, H, W, 3) RGB [0,1] -> (N, H/2, W/2, 2) region/affinity scores."""
    feats: List[jnp.ndarray] = []
    y = x
    for i, (p, (cout, pool)) in enumerate(zip(params["vgg"], _VGG_PLAN)):
        if pool:
            feats.append(y)
            y = _pool(y)
        y = _conv(p, y, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"vgg.{i}")
    feats.append(y)  # stride 8
    y = _pool(y)  # stride 16
    y = _conv(params["ext"][0], y, dilation=6, compute_dtype=compute_dtype,
              bn_ctx=bn_ctx, path="ext.0")
    y = _conv(params["ext"][1], y, compute_dtype=compute_dtype,
              bn_ctx=bn_ctx, path="ext.1")

    # U-Net merges with stride 8, 4, 2 features (feats[-1], [-2], [-3], [-4])
    skips = [feats[-1], feats[-2], feats[-3], feats[-4]]
    for ui, (up, skip) in enumerate(zip(params["ups"], skips)):
        y = _resize_to(y, skip.shape[1:3])
        y = jnp.concatenate([y, skip], axis=-1)
        y = _conv(up["c1"], y, compute_dtype=compute_dtype,
                  bn_ctx=bn_ctx, path=f"ups.{ui}.c1")
        y = _conv(up["c2"], y, compute_dtype=compute_dtype,
                  bn_ctx=bn_ctx, path=f"ups.{ui}.c2")

    h = y
    for i, p in enumerate(params["head"]):
        h = _conv(p, h, act=(i < len(params["head"]) - 1),
                  compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"head.{i}")
    return h  # (N, H/2, W/2, 2) raw scores


def _split_line_bands(
    prof: np.ndarray, low: float, prominence: float = 0.08, min_rows: int = 2
) -> List[Tuple[int, int]]:
    """1-D watershed over a component's row profile -> per-text-line bands.

    Stacked UI lines (name over stack, the panels ``read_region`` sees —
    reference detect.py:198 feeds the same panels to EasyOCR's CRAFT) keep
    the binarized mask connected through affinity bridges, but the REGION
    profile stays bimodal in y with a shallow valley. Accept a cut at the
    minimum between consecutive local maxima when it dips ``prominence``
    below both peaks; a single line's profile is unimodal, so it never cuts.
    """
    n = len(prof)
    p = prof
    if n >= 3:
        p = np.convolve(prof, [0.25, 0.5, 0.25], mode="same")
    peaks = [
        i for i in range(n)
        if p[i] > low
        and (i == 0 or p[i] >= p[i - 1])
        and (i == n - 1 or p[i] > p[i + 1])
    ]
    cuts: List[int] = []
    last = -1
    for pk in peaks:
        if last < 0:
            last = pk
            continue
        seg = p[last:pk + 1]
        vi = last + int(seg.argmin())
        if seg.min() <= min(p[last], p[pk]) - prominence:
            cuts.append(vi)
            last = pk
        elif p[pk] > p[last]:
            last = pk  # same band, keep the taller peak as its anchor
    edges = [0] + cuts + [n]
    return [(a, b) for a, b in zip(edges[:-1], edges[1:]) if b - a >= min_rows]


def text_regions_from_scores(
    scores: np.ndarray,
    text_threshold: float = 0.7,
    link_threshold: float = 0.4,
    low_text: float = 0.4,
    split_lines: bool = True,
) -> List[Tuple[int, int, int, int]]:
    """Host postprocess: region+affinity heatmaps -> text-line boxes.

    Thresholded union of region/link maps, connected components, per-component
    bounding boxes in heatmap coordinates (x1, y1, x2, y2) * 2 = image px.
    With ``split_lines`` (default), components whose region row-profile is
    multimodal are watershed-split into one box per text line — stacked
    name/stack panel rows sit close enough that their masks merge, and the
    CRNN recognizer downstream needs single-line crops.
    """
    import cv2

    region = scores[..., 0]
    link = scores[..., 1]
    binary = ((region > low_text) | (link > link_threshold)).astype(np.uint8)
    n, labels = cv2.connectedComponents(binary, connectivity=4)
    out = []
    for comp in range(1, n):
        mask = labels == comp
        if region[mask].max() < text_threshold:
            continue
        ys, xs = np.nonzero(mask)
        y0, y1 = int(ys.min()), int(ys.max()) + 1
        whole = (int(xs.min()) * 2, y0 * 2,
                 (int(xs.max()) + 1) * 2, y1 * 2)
        sub = np.where(mask[y0:y1], region[y0:y1], 0.0)
        bands = (_split_line_bands(sub.max(axis=1), low_text)
                 if split_lines else [])
        if len(bands) < 2:
            out.append(whole)
            continue
        for a, b in bands:
            if sub[a:b].max() < text_threshold:
                continue
            sy, sx = np.nonzero(mask[y0 + a:y0 + b])
            if sy.size == 0:
                continue
            out.append((int(sx.min()) * 2, (y0 + a + int(sy.min())) * 2,
                        (int(sx.max()) + 1) * 2,
                        (y0 + a + int(sy.max()) + 1) * 2))
    return out


def load_npz(path: str):
    """Load CRAFT params from the native npz checkpoint format."""
    from manual_yolo_tpu.core.serialization import load_params

    params, _meta = load_params(path)
    return jax.tree_util.tree_map(jnp.asarray, params)

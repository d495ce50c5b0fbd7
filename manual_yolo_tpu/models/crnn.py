"""CRNN text recognizer (feature CNN + BiLSTM + CTC head) in pure JAX.

TPU-native replacement for the EasyOCR ``english_g2`` recognizer the
reference calls at every OCR site (``detect.py:198``, ``pipe.py:256``,
``yolo.py:230``). Same family of architecture (VGG-style feature extractor,
bidirectional LSTM, CTC output over a charset); weights are trained in-repo
on synthetic renders (train/ocr.py) since no pretrained OCR weights ship
with the reference.

Input: gray crops (N, 32, W, 1) in [0,1]. Output: (N, W/4, |charset|+1)
logits, class 0 = CTC blank.

Layout/TPU notes: convs NHWC; the recurrence is a ``lax.scan`` over the
width axis with batched (N, C) matmuls — small but MXU-shaped; everything
jit-compiles to one program including the greedy decode (ops/ctc.py).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# charset: blank + printable subset used by every field type in the reference
# (card chars, digits, amount suffixes, name chars — yolo.py allowlists)
CHARSET = (
    "0123456789"
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".,$_-kKmMbB#:/() "
)
# dedupe preserving order (k/K etc appear once anyway via explicit sets)
_seen = set()
CHARSET = "".join(c for c in CHARSET if not (c in _seen or _seen.add(c)))
BLANK = 0
NUM_CLASSES = len(CHARSET) + 1  # + blank

IMG_H = 32


def char_to_id(c: str) -> int:
    return CHARSET.index(c) + 1


def ids_to_text(ids) -> str:
    return "".join(CHARSET[i - 1] for i in ids if i > 0)


def _init_conv(key, cin, cout, k=3):
    fan_in = cin * k * k
    bound = math.sqrt(6.0 / fan_in)
    return {
        "w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound),
        "b": jnp.zeros((cout,), jnp.float32),
        "g": jnp.ones((cout,), jnp.float32),  # layer-scale (norm-free training)
    }


def _init_dense(key, cin, cout):
    bound = math.sqrt(6.0 / cin)
    return {
        "w": jax.random.uniform(key, (cin, cout), jnp.float32, -bound, bound),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _init_lstm(key, cin, hidden):
    k1, k2 = jax.random.split(key)
    bound = math.sqrt(1.0 / hidden)
    return {
        "wi": jax.random.uniform(k1, (cin, 4 * hidden), jnp.float32, -bound, bound),
        "wh": jax.random.uniform(k2, (hidden, 4 * hidden), jnp.float32, -bound, bound),
        "b": jnp.zeros((4 * hidden,), jnp.float32),
    }


def init_params(key, hidden: int = 256, nc: int = NUM_CLASSES) -> Dict:
    ks = jax.random.split(key, 10)
    return {
        "c1": _init_conv(ks[0], 1, 64),
        "c2": _init_conv(ks[1], 64, 128),
        "c3": _init_conv(ks[2], 128, 256),
        "c4": _init_conv(ks[3], 256, 256),
        "c5": _init_conv(ks[4], 256, 512),
        "c6": _init_conv(ks[5], 512, 512),
        "lstm_fw1": _init_lstm(ks[6], 512, hidden),
        "lstm_bw1": _init_lstm(ks[6], 512, hidden),
        "lstm_fw2": _init_lstm(ks[7], 2 * hidden, hidden),
        "lstm_bw2": _init_lstm(ks[7], 2 * hidden, hidden),
        "proj": _init_dense(ks[8], 2 * hidden, nc),
    }


def _conv(p, x, stride=(1, 1), compute_dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=stride,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    return jax.nn.relu(y * p["g"] + p["b"])


def _maxpool(x, kh, kw):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
    )


def _lstm_scan(p, xs, reverse=False, compute_dtype=jnp.float32):
    """xs: (T, N, C) -> (T, N, H)."""
    H = p["wh"].shape[0]
    N = xs.shape[1]

    def step(carry, x):
        h, c = carry
        z = (
            jnp.dot(x.astype(compute_dtype), p["wi"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(compute_dtype), p["wh"].astype(compute_dtype),
                      preferred_element_type=jnp.float32)
            + p["b"]
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((N, H)), jnp.zeros((N, H)))
    _, ys = jax.lax.scan(step, init, xs, reverse=reverse)
    return ys


def forward(params, x, compute_dtype=jnp.float32) -> jnp.ndarray:
    """x: (N, H, W, 1) [0,1] (H a multiple of 8; canonically 32) ->
    logits (N, W//4, NUM_CLASSES)."""
    y = _conv(params["c1"], x, compute_dtype=compute_dtype)
    y = _maxpool(y, 2, 2)  # 16 x W/2
    y = _conv(params["c2"], y, compute_dtype=compute_dtype)
    y = _maxpool(y, 2, 2)  # 8 x W/4
    y = _conv(params["c3"], y, compute_dtype=compute_dtype)
    y = _conv(params["c4"], y, compute_dtype=compute_dtype)
    y = _maxpool(y, 2, 1)  # 4 x W/4
    y = _conv(params["c5"], y, compute_dtype=compute_dtype)
    y = _conv(params["c6"], y, compute_dtype=compute_dtype)
    # global max over the remaining height: 4 for the canonical 32-px input,
    # 8 for a 64-px high-resolution member — the SAME param tree serves any
    # input height that is a multiple of 8 (only this pool size varies)
    y = _maxpool(y, y.shape[1], 1)  # 1 x W/4
    seq = y[:, 0]  # (N, T, 512)
    xs = jnp.transpose(seq, (1, 0, 2))  # (T, N, C)
    fw = _lstm_scan(params["lstm_fw1"], xs, False, compute_dtype)
    bw = _lstm_scan(params["lstm_bw1"], xs, True, compute_dtype)
    h = jnp.concatenate([fw, bw], -1)
    fw2 = _lstm_scan(params["lstm_fw2"], h, False, compute_dtype)
    bw2 = _lstm_scan(params["lstm_bw2"], h, True, compute_dtype)
    h2 = jnp.concatenate([fw2, bw2], -1)  # (T, N, 2H)
    logits = (
        jnp.dot(h2, params["proj"]["w"], preferred_element_type=jnp.float32)
        + params["proj"]["b"]
    )
    return jnp.transpose(logits, (1, 0, 2))  # (N, T, nc)


def preprocess_gray(
    crop_gray: np.ndarray, target_w: int, stretch: float = 1.0,
    pad: Optional[int] = None, img_h: Optional[int] = None,
) -> np.ndarray:
    """Host: (h, w) uint8/float gray -> (img_h, target_w) [0,1], aspect kept,
    a few background-padded pixels on each side (CTC drops glyphs that
    touch the crop edge), remainder right-padded with the edge median.

    ``stretch`` > 1 widens the render beyond aspect (capped at target_w):
    more CTC time steps per glyph. Available for training-time width
    augmentation; an inference-side stretch TTA measured WORSE on the
    real-crop eval (models trained on aspect-true renders), so no runtime
    caller passes it.

    ``pad`` overrides the lateral background pad (default h//8): long
    edge-tight fields (game_id) measurably gain from a wider blank
    lead-in, short fields lose — callers pick per field kind.

    ``img_h`` selects the canvas height (default IMG_H=32); a 64-px canvas
    feeds the high-resolution ensemble member (2x the glyph pixels for the
    tiny UI fonts where digit confusions live)."""
    import cv2

    if img_h is None:
        img_h = IMG_H
    h, w = crop_gray.shape[:2]
    if crop_gray.dtype != np.float32:
        crop_gray = crop_gray.astype(np.float32) / 255.0
    bg = float(np.median(crop_gray))
    if pad is None:
        pad = max(2, h // 8)
    crop_gray = np.pad(crop_gray, ((2, 2), (pad, pad)), constant_values=bg)
    h, w = crop_gray.shape[:2]
    scale = img_h / max(h, 1)
    nw = max(1, min(target_w, int(round(w * scale * stretch))))
    # cubic when UPSCALING small text (reference OCR pass 3 upscales 2x
    # INTER_CUBIC, detect.py:215-221); linear when shrinking
    interp = cv2.INTER_CUBIC if scale * stretch > 1.0 else cv2.INTER_LINEAR
    resized = cv2.resize(crop_gray, (nw, img_h), interpolation=interp)
    canvas = np.full((img_h, target_w), float(np.median(resized[:, -1])), np.float32)
    canvas[:, :nw] = resized
    return canvas

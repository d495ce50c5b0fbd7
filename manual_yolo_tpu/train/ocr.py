"""Synthetic-text CRNN training.

No pretrained OCR weights exist in the reference repo (EasyOCR downloads
its own at runtime — a vendored-engine behaviour; SURVEY.md §2b), and this
environment has no egress, so the recognizer is trained here on synthetic
renders of exactly the string distributions the reference reads:

  * amounts  — "1500", "1.2K", "$2,500", "0.5M" (yolo.py numeric allowlist)
  * names    — alnum/underscore, 2-25 chars (yolo.py name pattern)
  * game ids — digit strings, "Game_AB12" forms
  * card     — "As", "Th", "10c" strings (card pattern)

Renders use the DejaVu font family at varied sizes/weights with photometric
jitter, noise, blur, and polarity inversion so the model is robust to the
binarised/CLAHE'd crops the OCR engine feeds it (runtime/ocr.py).
CTC loss via optax; jit train step on device.
"""

from __future__ import annotations

import os
import string
import time
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manual_yolo_tpu.core.serialization import save_params
from manual_yolo_tpu.models import crnn

FONTS = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
]


def random_amount(rng) -> str:
    style = rng.integers(0, 5)
    if style == 0:
        return str(rng.integers(1, 1_000_000))
    if style == 1:
        return f"{rng.integers(1, 1000)}.{rng.integers(0, 10)}K"
    if style == 2:
        v = rng.integers(1000, 10_000_000)
        s = f"{v:,}"
        return ("$" + s) if rng.random() < 0.5 else s
    if style == 3:
        return f"{rng.integers(0, 100)}.{rng.integers(0, 100):02d}"
    return f"{rng.integers(1, 100)}.{rng.integers(0, 10)}M"


def random_name(rng) -> str:
    n = int(rng.integers(2, 14))
    chars = string.ascii_letters + string.digits + "_"
    return "".join(chars[rng.integers(0, len(chars))] for _ in range(n))


def random_game_id(rng) -> str:
    if rng.random() < 0.5:
        return str(rng.integers(1000, 10_000_000))
    return "Game_" + "".join(
        string.ascii_uppercase[rng.integers(0, 26)] for _ in range(2)
    ) + str(rng.integers(10, 100))


def random_card(rng) -> str:
    ranks = ["A", "K", "Q", "J", "T", "10", "2", "3", "4", "5", "6", "7", "8", "9"]
    suits = ["s", "h", "d", "c", "S", "H", "D", "C"]
    return ranks[rng.integers(0, len(ranks))] + suits[rng.integers(0, len(suits))]


def random_text(rng) -> str:
    r = rng.random()
    if r < 0.40:
        amt = random_amount(rng)
        # poker-UI framing the reference's pot/bet fields carry
        # (e.g. "Pot:3K", detect.py total_pot crops)
        pre = rng.random()
        if pre < 0.10:
            return "Pot:" + amt
        if pre < 0.15:
            return "Pot: " + amt
        return amt
    if r < 0.65:
        return random_name(rng)
    if r < 0.80:
        return random_game_id(rng)
    if r < 0.92:
        return random_card(rng)
    # generic word-ish noise
    return "".join(
        crnn.CHARSET[rng.integers(1, len(crnn.CHARSET))] for _ in range(rng.integers(1, 10))
    ).strip() or "0"


_FONT_CACHE: Dict[Tuple[str, int], object] = {}


def render_text(rng, text: str, target_w: int) -> np.ndarray:
    """Render to a (32, target_w) float image in [0,1] with augmentation."""
    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    size = int(rng.integers(18, 30))
    font_path = FONTS[rng.integers(0, len(FONTS))]
    key = (font_path, size)
    if key not in _FONT_CACHE:
        _FONT_CACHE[key] = ImageFont.truetype(font_path, size)
    font = _FONT_CACHE[key]

    pad = int(rng.integers(2, 8))
    bbox = font.getbbox(text)
    tw = max(1, bbox[2] - bbox[0])
    th = max(1, bbox[3] - bbox[1])
    img = Image.new("L", (tw + 2 * pad, th + 2 * pad), 255)
    ImageDraw.Draw(img).text((pad - bbox[0], pad - bbox[1]), text, fill=0, font=font)

    if rng.random() < 0.3:
        img = img.filter(ImageFilter.GaussianBlur(float(rng.random()) * 1.2))
    arr = np.asarray(img, np.float32) / 255.0
    # poker UIs are mostly light text on dark chrome: bias polarity flips
    if rng.random() < 0.55:
        arr = 1.0 - arr
    # contrast/brightness jitter + noise
    arr = np.clip(arr * rng.uniform(0.6, 1.2) + rng.uniform(-0.15, 0.25), 0, 1)
    if rng.random() < 0.5:
        arr = np.clip(arr + rng.normal(0, rng.uniform(0.01, 0.07), arr.shape), 0, 1)
    # chip/icon distractor: a filled disc left or right of the text
    if rng.random() < 0.15:
        h, w = arr.shape
        cy = h // 2 + int(rng.integers(-3, 4))
        cx = int(rng.integers(0, max(w // 5, 1))) if rng.random() < 0.5 else (
            w - 1 - int(rng.integers(0, max(w // 5, 1)))
        )
        rad = int(rng.integers(3, max(h // 2, 4)))
        ys, xs = np.ogrid[:h, :w]
        disc = (ys - cy) ** 2 + (xs - cx) ** 2 <= rad**2
        arr[disc] = float(rng.random())
    # random edge clipping (tight detector boxes cut glyph edges)
    if rng.random() < 0.3:
        h, w = arr.shape
        cut = int(rng.integers(1, max(w // 12, 2)))
        arr = arr[:, cut:] if rng.random() < 0.5 else arr[:, : w - cut]
    return crnn.preprocess_gray(arr, target_w)


@dataclass
class OCRTrainConfig:
    out_path: str = "weights/crnn_synth.npz"
    steps: int = 6000
    batch: int = 64
    width: int = 256
    max_label: int = 28
    lr: float = 1e-3
    hidden: int = 256
    seed: int = 0
    eval_every: int = 500
    compute_dtype: str = "float32"
    pool_size: int = 20000  # pre-rendered sample pool (renders off hot loop)


def make_batch(rng, cfg: OCRTrainConfig):
    imgs = np.zeros((cfg.batch, crnn.IMG_H, cfg.width, 1), np.float32)
    labels = np.zeros((cfg.batch, cfg.max_label), np.int32)
    lab_pad = np.ones((cfg.batch, cfg.max_label), np.float32)
    texts = []
    for i in range(cfg.batch):
        t = random_text(rng)[: cfg.max_label]
        texts.append(t)
        imgs[i, :, :, 0] = render_text(rng, t, cfg.width)
        ids = [crnn.char_to_id(c) for c in t]
        labels[i, : len(ids)] = ids
        lab_pad[i, : len(ids)] = 0.0  # 0 = valid for optax.ctc_loss
    return imgs, labels, lab_pad, texts


def build_pool(rng, cfg: OCRTrainConfig, size: int):
    """Pre-render a sample pool so PIL rendering stays off the train loop."""
    imgs = np.zeros((size, crnn.IMG_H, cfg.width, 1), np.float32)
    labels = np.zeros((size, cfg.max_label), np.int32)
    lab_pad = np.ones((size, cfg.max_label), np.float32)
    texts = []
    for i in range(size):
        t = random_text(rng)[: cfg.max_label]
        texts.append(t)
        imgs[i, :, :, 0] = render_text(rng, t, cfg.width)
        ids = [crnn.char_to_id(c) for c in t]
        labels[i, : len(ids)] = ids
        lab_pad[i, : len(ids)] = 0.0
    return imgs, labels, lab_pad, texts


def train_ocr(cfg: OCRTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params = crnn.init_params(jax.random.PRNGKey(cfg.seed), cfg.hidden)
    sched = optax.warmup_cosine_decay_schedule(
        cfg.lr * 0.05, cfg.lr, min(300, cfg.steps // 5), cfg.steps, cfg.lr * 0.02
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs, labels, lab_pad):
        def loss_fn(p):
            logits = crnn.forward(p, imgs, cdt)  # (N, T, C)
            T = logits.shape[1]
            logit_pad = jnp.zeros((logits.shape[0], T), jnp.float32)
            per = optax.ctc_loss(logits, logit_pad, labels, lab_pad)
            return jnp.mean(per)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def infer(params, imgs):
        from manual_yolo_tpu.ops.ctc import greedy_decode

        return greedy_decode(crnn.forward(params, imgs, cdt))

    def exact_match(params, n=64) -> float:
        from manual_yolo_tpu.ops.ctc import decode_to_text

        imgs, labels, lab_pad, texts = make_batch(rng, cfg)
        ids, conf = jax.device_get(infer(params, jnp.asarray(imgs)))
        good = sum(decode_to_text(ids[i]) == texts[i] for i in range(len(texts)))
        return good / len(texts)

    t0 = time.time()
    log(f"rendering {cfg.pool_size}-sample pool...")
    pool = build_pool(rng, cfg, cfg.pool_size)
    log(f"pool ready in {time.time()-t0:.0f}s")
    p_imgs, p_labels, p_pad, _texts = pool

    best_acc = 0.0
    for s in range(cfg.steps):
        idx = rng.integers(0, cfg.pool_size, cfg.batch)
        imgs, labels, lab_pad = p_imgs[idx], p_labels[idx], p_pad[idx]
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(labels),
            jnp.asarray(lab_pad),
        )
        if (s + 1) % cfg.eval_every == 0 or s == cfg.steps - 1:
            acc = exact_match(params)
            log(
                f"step {s+1}/{cfg.steps} ctc {float(loss):.3f} "
                f"exact {acc:.3f} ({time.time()-t0:.0f}s)"
            )
            if acc >= best_acc:
                best_acc = acc
                save_params(
                    cfg.out_path, params,
                    meta={"hidden": cfg.hidden, "width": cfg.width,
                          "exact_match": acc, "step": s + 1},
                )
    return {"best_exact": best_acc, "wall_s": time.time() - t0}

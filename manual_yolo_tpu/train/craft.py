"""CRAFT text-detector training on synthetic multi-line scenes.

EasyOCR's ``readtext`` is CRAFT text detection THEN CRNN recognition
(reference ``detect.py:198`` runs both implicitly). No CRAFT weights ship
with the reference and this environment has no egress, so — like the CRNN
(train/ocr.py) — the detector is trained here on synthetic scenes: 1-4
text lines scattered on poker-UI-style backgrounds, with the standard CRAFT
gaussian supervision (region heatmap = per-character gaussians, affinity
heatmap = gaussians between adjacent characters), MSE loss, train-mode BN.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manual_yolo_tpu.core.serialization import save_params
from manual_yolo_tpu.models import craft
from manual_yolo_tpu.train.ocr import FONTS, random_sample


def _gauss2d(h: int, w: int, cy: float, cx: float, sy: float, sx: float):
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    return np.exp(
        -(((ys - cy) ** 2) / (2 * sy**2) + ((xs - cx) ** 2) / (2 * sx**2))
    )


def render_scene(rng, size: int = 256) -> Tuple[np.ndarray, np.ndarray, List]:
    """-> (rgb (size,size,3) [0,1], heat (size/2,size/2,2), line boxes px)."""
    from PIL import Image, ImageDraw, ImageFont

    # poker-UI-ish background: dark chrome / green felt / light panel
    style = rng.random()
    if style < 0.5:
        bg = rng.uniform(0.05, 0.25)
    elif style < 0.8:
        bg = rng.uniform(0.25, 0.5)
    else:
        bg = rng.uniform(0.75, 0.95)
    img = np.full((size, size, 3), bg, np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)

    hh = size // 2
    heat = np.zeros((hh, hh, 2), np.float32)
    n_lines = int(rng.integers(1, 5))
    boxes = []
    used_rows: List[Tuple[int, int]] = []
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for _ in range(n_lines):
        text = random_sample(rng)[0][:16]
        if not text.strip():
            continue
        fsize = int(rng.integers(14, 30))
        font = ImageFont.truetype(FONTS[rng.integers(0, len(FONTS))], fsize)
        bbox = font.getbbox(text)
        tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
        if tw >= size - 8 or th >= size // 3:
            continue
        x0 = int(rng.integers(2, size - tw - 4))
        y0 = int(rng.integers(2, size - th - 4))
        if any(abs(y0 - r0) < th + 6 for r0, _ in used_rows):
            continue  # keep lines vertically separated
        used_rows.append((y0, y0 + th))
        light = bg < 0.5
        fill = int(rng.uniform(200, 255)) if light else int(rng.uniform(0, 60))
        draw.text((x0 - bbox[0], y0 - bbox[1]), text, fill=(fill,) * 3, font=font)
        boxes.append((x0, y0, x0 + tw, y0 + th))

        # per-character gaussians (region) + inter-character (affinity)
        centers = []
        cx = x0
        for ch in text:
            cw = max(font.getlength(ch), 1.0)
            if ch != " ":
                centers.append((x0 - bbox[0] + (cx - x0) + cw / 2, y0 + th / 2, cw))
            cx += cw
        for (ccx, ccy, cw) in centers:
            heat[..., 0] = np.maximum(
                heat[..., 0],
                _gauss2d(hh, hh, ccy / 2, ccx / 2, max(th / 5, 1.2), max(cw / 5, 1.0)),
            )
        for (a, b) in zip(centers, centers[1:]):
            mx, my = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
            heat[..., 1] = np.maximum(
                heat[..., 1],
                _gauss2d(hh, hh, my / 2, mx / 2, max(th / 5, 1.2),
                         max((b[0] - a[0]) / 3.5, 1.0)),
            )

    img = np.asarray(pil, np.float32) / 255.0
    # photometric jitter
    img = np.clip(img * rng.uniform(0.8, 1.15) + rng.uniform(-0.08, 0.08), 0, 1)
    return img.astype(np.float32), heat, boxes


@dataclass
class CraftTrainConfig:
    out_path: str = "weights/craft_synth.npz"
    steps: int = 3000
    batch: int = 8
    size: int = 256
    lr: float = 5e-4
    seed: int = 0
    eval_every: int = 250
    pool_size: int = 2000
    compute_dtype: str = "bfloat16"


def build_pool(rng, cfg: CraftTrainConfig):
    imgs = np.zeros((cfg.pool_size, cfg.size, cfg.size, 3), np.float32)
    heats = np.zeros((cfg.pool_size, cfg.size // 2, cfg.size // 2, 2), np.float32)
    metas = []
    for i in range(cfg.pool_size):
        imgs[i], heats[i], boxes = render_scene(rng, cfg.size)
        metas.append(boxes)
    return imgs, heats, metas


def _iou(a, b) -> float:
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    union = (
        (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    )
    return inter / max(union, 1)


def _line_f1(pred_boxes, gt_boxes, iou_thr=0.3) -> float:
    """Greedy line-box F1 (recall alone would reward over-segmentation)."""
    if not gt_boxes:
        return 1.0 if not pred_boxes else 0.0
    if not pred_boxes:
        return 0.0
    matched = set()
    hit = 0
    for g in gt_boxes:
        for pi, p in enumerate(pred_boxes):
            if pi in matched:
                continue
            if _iou(g, p) >= iou_thr:
                matched.add(pi)
                hit += 1
                break
    rec = hit / len(gt_boxes)
    prec = hit / len(pred_boxes)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def train_craft(cfg: CraftTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params = craft.init_params(jax.random.PRNGKey(cfg.seed))
    sched = optax.warmup_cosine_decay_schedule(
        cfg.lr * 0.05, cfg.lr, min(200, cfg.steps // 5), cfg.steps, cfg.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            ctx = craft.BNCtx()
            scores = craft.forward(p, x, cdt, bn_ctx=ctx)
            return jnp.mean((scores - y) ** 2), ctx.updates

        (loss, bn_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = craft.apply_bn_updates(params, bn_updates)
        return params, opt_state, loss

    @jax.jit
    def infer(params, x):
        return craft.forward(params, x, cdt)

    t0 = time.time()
    log(f"rendering {cfg.pool_size}-scene pool...")
    imgs, heats, metas = build_pool(rng, cfg)
    log(f"pool ready in {time.time()-t0:.0f}s")

    best = -1.0
    for s in range(cfg.steps):
        idx = rng.integers(0, cfg.pool_size, cfg.batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(imgs[idx]), jnp.asarray(heats[idx])
        )
        if (s + 1) % cfg.eval_every == 0 or s == cfg.steps - 1:
            eidx = rng.integers(0, cfg.pool_size, cfg.batch)
            scores = np.asarray(infer(params, jnp.asarray(imgs[eidx])))
            f1s = [
                _line_f1(
                    craft.text_regions_from_scores(scores[i]), metas[int(e)]
                )
                for i, e in enumerate(eidx)
            ]
            f1 = float(np.mean(f1s))
            log(
                f"step {s+1}/{cfg.steps} mse {float(loss):.5f} "
                f"line_f1 {f1:.3f} ({time.time()-t0:.0f}s)"
            )
            if f1 >= best:
                best = f1
                save_params(
                    cfg.out_path, params,
                    meta={"size": cfg.size, "line_f1": f1, "step": s + 1},
                )
    return {"best_line_f1": best, "wall_s": time.time() - t0}

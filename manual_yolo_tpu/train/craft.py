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
    # real labelled UI crops composited into scenes (line-level gaussian
    # supervision): teaches real UI pixels + the tightly-stacked two-line
    # name/stack panels the synthetic renderer's row separation never shows
    real_labels: str = ""
    real_splits: Tuple[str, ...] = ("train", "valid")
    real_scene_frac: float = 0.5
    # fraction of scenes tiled with whole labeled PANELS cut from real
    # table screenshots (train/valid splits), the eval distribution of
    # cli/eval_craft; requires the reference dataset mount
    panel_scene_frac: float = 0.0
    panel_splits: Tuple[str, ...] = ("train", "valid")
    # fine-tune from an existing checkpoint instead of random init (e.g.
    # warm-start the real-crop run from the synthetic-scene weights)
    init_from: str = ""


def _paste_crop_heat(heat, x0, y0, w, h, n_chars):
    """Line-level CRAFT supervision for a pasted real crop: char centers
    approximated as evenly spaced across the crop width (char-exact positions
    are unknown for real crops; even spacing is enough for line detection)."""
    hh = heat.shape[0]
    n = max(int(n_chars), 1)
    cw = w / n
    cy = y0 + h / 2
    for ci in range(n):
        cx = x0 + (ci + 0.5) * cw
        heat[..., 0] = np.maximum(
            heat[..., 0],
            _gauss2d(hh, hh, cy / 2, cx / 2, max(h / 5, 1.2), max(cw / 5, 1.0)),
        )
        if ci:
            mx = x0 + ci * cw
            heat[..., 1] = np.maximum(
                heat[..., 1],
                _gauss2d(hh, hh, cy / 2, mx / 2, max(h / 5, 1.2),
                         max(cw / 3.5, 1.0)),
            )


def render_scene_real(rng, real_pool, size: int = 256):
    """Scene composited from REAL UI crops: 1-3 groups, where a group is a
    single crop or a vertically-stacked pair with a 2-8 px gap (the UI's
    name-over-stack panel layout)."""
    import cv2

    style = rng.random()
    if style < 0.6:
        bg = rng.uniform(0.05, 0.25)
    elif style < 0.85:
        bg = rng.uniform(0.25, 0.5)
    else:
        bg = rng.uniform(0.75, 0.95)
    img = np.full((size, size, 3), bg, np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    hh = size // 2
    heat = np.zeros((hh, hh, 2), np.float32)
    boxes = []
    used_rows = []
    for _ in range(int(rng.integers(1, 4))):
        pair = rng.random() < 0.5
        members = []
        for _m in range(2 if pair else 1):
            crop, text = real_pool[int(rng.integers(0, len(real_pool)))]
            ch, cw = crop.shape[:2]
            scale = rng.uniform(0.8, 1.4)
            nh = int(np.clip(ch * scale, 12, size // 4))
            nw = int(np.clip(cw * scale, 8, size - 8))
            members.append(
                (cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR),
                 text)
            )
        gap = int(rng.integers(2, 9)) if pair else 0
        gh = sum(m[0].shape[0] for m in members) + gap * (len(members) - 1)
        gw = max(m[0].shape[1] for m in members)
        if gw >= size - 8 or gh >= size - 8:
            continue
        x0 = int(rng.integers(4, size - gw - 4))
        y0 = int(rng.integers(4, size - gh - 4))
        if any(not (y0 + gh < r0 - 4 or y0 > r1 + 4) for r0, r1 in used_rows):
            continue  # groups must not overlap vertically
        used_rows.append((y0, y0 + gh))
        yy = y0
        for m_img, m_text in members:
            mh, mw = m_img.shape[:2]
            # crops are BGR; scenes are consumed as RGB (runtime/ocr.py
            # read_region feeds img_bgr[..., ::-1])
            img[yy : yy + mh, x0 : x0 + mw] = (
                m_img[..., ::-1].astype(np.float32) / 255.0
            )
            boxes.append((x0, yy, x0 + mw, yy + mh))
            _paste_crop_heat(heat, x0, yy, mw, mh, len(m_text))
            yy += mh + gap
    img = np.clip(img * rng.uniform(0.85, 1.1) + rng.uniform(-0.05, 0.05), 0, 1)
    return img.astype(np.float32), heat, boxes


def build_panel_pool(splits=("train", "valid")) -> List:
    """Whole labeled PANELS cut from real table screenshots: the region
    (with its real felt/UI background) plus its text-line boxes, exactly
    the regions ``read_region`` sees at runtime and ``cli/eval_craft``
    scores (different splits — eval uses 'test'). Line char counts are
    estimated from aspect ratio (line-level supervision only needs rough
    spacing)."""
    import cv2

    from manual_yolo_tpu.cli.eval_craft import build_regions, load_labeled_images

    pool = []
    for img_path, fields in load_labeled_images(splits):
        img = cv2.imread(img_path)
        if img is None:
            continue
        h, w = img.shape[:2]
        for (rx1, ry1, rx2, ry2), lines in build_regions(fields, w, h):
            crop = img[ry1:ry2, rx1:rx2]
            if crop.size == 0 or crop.shape[0] < 14 or crop.shape[1] < 14:
                continue
            rel = [(x1 - rx1, y1 - ry1, x2 - rx1, y2 - ry1)
                   for x1, y1, x2, y2 in lines]
            pool.append((crop, rel))
    return pool


def render_scene_panel(rng, panel_pool, size: int = 256):
    """Scene tiled with real labeled panels (their own background margin
    included) at jittered scale/brightness — the eval distribution."""
    import cv2

    bg = rng.uniform(0.05, 0.4)
    img = np.full((size, size, 3), bg, np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    hh = size // 2
    heat = np.zeros((hh, hh, 2), np.float32)
    boxes = []
    used_rows = []
    for _ in range(int(rng.integers(1, 4))):
        crop, rel = panel_pool[int(rng.integers(0, len(panel_pool)))]
        ch, cw = crop.shape[:2]
        scale = rng.uniform(0.75, 1.5)
        nh = int(np.clip(ch * scale, 14, size - 8))
        nw = int(np.clip(cw * scale, 14, size - 8))
        sy, sx = nh / ch, nw / cw
        patch = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x0 = int(rng.integers(2, max(3, size - nw - 2)))
        y0 = int(rng.integers(2, max(3, size - nh - 2)))
        if any(not (y0 + nh < r0 - 2 or y0 > r1 + 2) for r0, r1 in used_rows):
            continue
        used_rows.append((y0, y0 + nh))
        gain = rng.uniform(0.85, 1.1)
        img[y0:y0 + nh, x0:x0 + nw] = np.clip(
            patch[..., ::-1].astype(np.float32) / 255.0 * gain, 0, 1
        )
        for lx1, ly1, lx2, ly2 in rel:
            bx1 = x0 + lx1 * sx
            by1 = y0 + ly1 * sy
            bx2 = x0 + lx2 * sx
            by2 = y0 + ly2 * sy
            bw, bh = bx2 - bx1, by2 - by1
            if bw < 4 or bh < 4:
                continue
            n_chars = int(np.clip(round(bw / max(bh * 0.6, 1)), 1, 24))
            _paste_crop_heat(heat, bx1, by1, bw, bh, n_chars)
            boxes.append((int(bx1), int(by1), int(bx2), int(by2)))
    img = np.clip(img + rng.uniform(-0.04, 0.04), 0, 1)
    return img.astype(np.float32), heat, boxes


def build_pool(rng, cfg: CraftTrainConfig, real_pool=None, panel_pool=None):
    imgs = np.zeros((cfg.pool_size, cfg.size, cfg.size, 3), np.float32)
    heats = np.zeros((cfg.pool_size, cfg.size // 2, cfg.size // 2, 2), np.float32)
    metas = []
    for i in range(cfg.pool_size):
        r = rng.random()
        if panel_pool and r < cfg.panel_scene_frac:
            imgs[i], heats[i], boxes = render_scene_panel(
                rng, panel_pool, cfg.size
            )
        elif real_pool and r < cfg.panel_scene_frac + cfg.real_scene_frac:
            imgs[i], heats[i], boxes = render_scene_real(rng, real_pool, cfg.size)
        else:
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
    if cfg.init_from and os.path.exists(cfg.init_from):
        params = craft.load_npz(cfg.init_from)
        log(f"warm-start from {cfg.init_from}")
    else:
        params = craft.init_params(jax.random.PRNGKey(cfg.seed))
    sched = optax.warmup_cosine_decay_schedule(
        cfg.lr * 0.05, cfg.lr, min(200, cfg.steps // 5), cfg.steps, cfg.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))
    opt_state = tx.init(params)

    t0 = time.time()
    real_pool = None
    if cfg.real_labels and os.path.exists(cfg.real_labels):
        from manual_yolo_tpu.cli.eval_ocr import load_real_crops

        real_pool = [
            (crop, text)
            for crop, _cname, text in load_real_crops(
                cfg.real_labels, splits=tuple(cfg.real_splits)
            )
        ]
        log(f"real crop pool: {len(real_pool)} crops from {cfg.real_splits}")
    panel_pool = None
    if cfg.panel_scene_frac > 0:
        try:
            panel_pool = build_panel_pool(cfg.panel_splits)
            log(f"panel pool: {len(panel_pool)} labeled panels "
                f"from {cfg.panel_splits}")
        except Exception as e:
            log(f"panel pool unavailable ({e}); skipping panel scenes")
    log(f"rendering {cfg.pool_size}-scene pool...")
    imgs, heats, metas = build_pool(rng, cfg, real_pool, panel_pool)
    log(f"pool ready in {time.time()-t0:.0f}s")

    # resident device pools (uint8, uploaded once as flat bytes): per-step
    # host->device traffic is gather indices only, so training stays
    # compute-bound on the degraded tunnel link (same recipe as train/ocr.py).
    # channel-last pools are kept as (N, H, W*C) — a trailing dim of 3 would
    # pad 42x under the TPU (8,128) tile layout; W*C is a multiple of 128 —
    # and only the gathered BATCH is reshaped to NHWC.
    from manual_yolo_tpu.train.ocr import _device_put_pool_u8

    n_, h_, w_, c_ = imgs.shape
    hh_, hw_, hc_ = heats.shape[1:]
    d_imgs = _device_put_pool_u8(imgs.reshape(n_, h_, w_ * c_))
    d_heats = _device_put_pool_u8(heats.reshape(n_, hh_, hw_ * hc_))

    # pools enter the jitted programs as ARGUMENTS, never closed-over
    # constants: a captured Array is baked into the HLO as a literal, which
    # bloats the compile payload by the full pool size
    @jax.jit
    def run_chunk(params, opt_state, pool_imgs, pool_heats, idx):
        def one_step(carry, idx1):
            params, opt_state = carry
            x = pool_imgs[idx1].reshape(-1, h_, w_, c_).astype(jnp.float32) / 255.0
            y = (
                pool_heats[idx1].reshape(-1, hh_, hw_, hc_).astype(jnp.float32)
                / 255.0
            )

            def loss_fn(p):
                ctx = craft.BNCtx()
                scores = craft.forward(p, x, cdt, bn_ctx=ctx)
                return jnp.mean((scores - y) ** 2), ctx.updates

            (loss, bn_updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = craft.apply_bn_updates(params, bn_updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), idx
        )
        return params, opt_state, losses[-1]

    @jax.jit
    def infer_pool(params, pool_imgs, idx):
        x = pool_imgs[idx].reshape(-1, h_, w_, c_).astype(jnp.float32) / 255.0
        return craft.forward(params, x, cdt)

    chunk = max(1, cfg.eval_every // 2)
    best = -1.0
    s = 0
    while s < cfg.steps:
        n = min(chunk, cfg.steps - s)
        idx = rng.integers(0, cfg.pool_size, (n, cfg.batch)).astype(np.int32)
        params, opt_state, loss = run_chunk(
            params, opt_state, d_imgs, d_heats, jnp.asarray(idx)
        )
        s += n
        if s % cfg.eval_every == 0 or s >= cfg.steps:
            eidx = rng.integers(0, cfg.pool_size, cfg.batch).astype(np.int32)
            scores = np.asarray(infer_pool(params, d_imgs, jnp.asarray(eidx)))
            f1s = [
                _line_f1(
                    craft.text_regions_from_scores(scores[i]), metas[int(e)]
                )
                for i, e in enumerate(eidx)
            ]
            f1 = float(np.mean(f1s))
            log(
                f"step {s}/{cfg.steps} mse {float(loss):.5f} "
                f"line_f1 {f1:.3f} ({time.time()-t0:.0f}s)"
            )
            if f1 >= best:
                best = f1
                save_params(
                    cfg.out_path, params,
                    meta={"size": cfg.size, "line_f1": f1, "step": s},
                )
    return {"best_line_f1": best, "wall_s": time.time() - t0}

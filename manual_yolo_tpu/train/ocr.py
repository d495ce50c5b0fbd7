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
from typing import Dict, List, Optional, Tuple

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
    style = rng.integers(0, 9)
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
    if style == 4:
        return f"{rng.integers(1, 100)}.{rng.integers(0, 10)}M"
    # UI styles observed on real crops (data/ocr_real): plain K, lakh,
    # big-blind denominations, exact zero
    if style == 5:
        return f"{rng.integers(1, 100)}K"
    if style == 6:
        return f"{rng.integers(1, 10)}.{rng.integers(0, 100):02d}L".replace(".00", "")
    if style == 7:
        v = rng.random()
        if v < 0.33:
            return f"{rng.integers(1, 250)}BB"
        if v < 0.66:
            return f"{rng.integers(0, 100)}.{rng.integers(1, 10)}BB"
        return f"{rng.integers(1, 3)}.{rng.integers(0, 100):02d}KBB"
    return "0"


_NAME_WORDS = [
    "Solemn", "Influx", "Cloudy", "Comb", "Chrome", "Green", "Alpine",
    "Noyes", "Sacred", "Firme", "Skyborn", "Graft", "Inner", "Italic",
    "Secret", "Cutler", "Auburn", "Insight", "Iron", "Contest", "Dream",
    "Fiddle", "Flaming", "Lizard", "Angsty", "Modish", "Darker", "Joyful",
    "Quiet", "Homer", "Deadly", "Fearer", "August", "Mesmer", "Mortal",
    "Issue", "Cruel", "Goof", "Wild", "Lariat", "Dark", "Bower", "Bronze",
    "Nuance", "grid", "iron", "sport", "fire", "time", "money", "ball",
    "snow", "speed", "cube", "game", "goal", "fer", "climber", "acrobat",
    "basket", "berserker", "unifight", "turumchi", "ruata", "vk", "fp",
]


def random_name(rng) -> str:
    """Name styles matching the real UI distribution (data/ocr_real):
    CamelCase pairs, lowercase word+digits, dotted, plain random."""
    style = rng.random()
    if style < 0.35:  # CamelCase pair + optional digits
        w = _NAME_WORDS[rng.integers(0, len(_NAME_WORDS))].capitalize()
        w2 = _NAME_WORDS[rng.integers(0, len(_NAME_WORDS))].capitalize()
        s = w + w2
        if rng.random() < 0.4:
            s += str(rng.integers(0, 1000))
    elif style < 0.6:  # lowercase word(s) + digits
        w = _NAME_WORDS[rng.integers(0, len(_NAME_WORDS))].lower()
        w2 = _NAME_WORDS[rng.integers(0, len(_NAME_WORDS))].lower()
        s = w + (w2 if rng.random() < 0.5 else "") + str(rng.integers(0, 100000))
    elif style < 0.7:  # dotted like "s.kaahyap"
        w = _NAME_WORDS[rng.integers(0, len(_NAME_WORDS))].lower()
        s = string.ascii_lowercase[rng.integers(0, 26)] + "." + w
    else:  # plain random (round-1 distribution)
        n = int(rng.integers(2, 14))
        chars = string.ascii_letters + string.digits + "_"
        s = "".join(chars[rng.integers(0, len(chars))] for _ in range(n))
    # doubled characters ('snowsport55', 'sportfire443'): adjacent repeats
    # are where greedy CTC drops glyphs (no blank predicted between them) —
    # the real-crop eval's dominant name error class, so oversample them
    if rng.random() < 0.12:
        i = int(rng.integers(0, len(s)))
        s = s[: i + 1] + s[i] + s[i + 1 :]
    # UI truncation ellipsis on long names
    if len(s) >= 10 and rng.random() < 0.45:
        s = s[: rng.integers(8, min(len(s), 13))] + "..."
    return s[:24]


def random_game_id(rng) -> str:
    r = rng.random()
    if r < 0.45:
        # the real crop is a title-bar line: "| Game ID : 232025507"
        return f"Game ID : {rng.integers(232000000, 233000000)}"
    if r < 0.7:
        return str(rng.integers(1000, 10_000_000))
    return "Game_" + "".join(
        string.ascii_uppercase[rng.integers(0, 26)] for _ in range(2)
    ) + str(rng.integers(10, 100))


def random_card(rng) -> str:
    ranks = ["A", "K", "Q", "J", "T", "10", "2", "3", "4", "5", "6", "7", "8", "9"]
    suits = ["s", "h", "d", "c", "S", "H", "D", "C"]
    return ranks[rng.integers(0, len(ranks))] + suits[rng.integers(0, len(suits))]


def random_text(rng) -> str:
    return random_sample(rng)[0]


def random_sample(rng, kinds: Optional[frozenset] = None) -> Tuple[str, str]:
    """-> (label, unlabeled_suffix). The suffix is RENDERED after the label
    (chip disc + side-pot amount, like the real 'Pot:3K [chip]2K' crops) but
    excluded from the CTC target — the net learns the extraction semantics:
    read the field value, ignore the chip and its amount.

    ``kinds`` (None = all) restricts synthesis to specific field kinds
    ('numeric', 'name', 'game_id', 'card', 'generic') by rejection — used
    when training a kind-gated ensemble member (runtime/ocr.py _add_group)."""
    while True:
        kind, out = _random_sample_once(rng)
        if kinds is None or kind in kinds:
            return out


def _random_sample_once(rng) -> Tuple[str, Tuple[str, str]]:
    r = rng.random()
    if r < 0.40:
        amt = random_amount(rng)
        pre = rng.random()
        # poker-UI framing the reference's pot/bet fields carry
        # (e.g. "Pot:3K", detect.py total_pot crops)
        if pre < 0.18:
            amt = ("Pot:" if pre < 0.12 else "Pot: ") + amt
        suffix = random_amount(rng) if rng.random() < 0.30 else ""
        return "numeric", (amt, suffix)
    if r < 0.65:
        return "name", (random_name(rng), "")
    if r < 0.80:
        return "game_id", (random_game_id(rng), "")
    if r < 0.92:
        return "card", (random_card(rng), "")
    # generic word-ish noise
    t = "".join(
        crnn.CHARSET[rng.integers(1, len(crnn.CHARSET))] for _ in range(rng.integers(1, 10))
    ).strip() or "0"
    return "generic", (t, "")


_FONT_CACHE: Dict[Tuple[str, int], object] = {}


def _draw_chip(rng, arr: np.ndarray, cx: int, cy: int, rad: int) -> None:
    """Poker-chip glyph: bright disc + darker inner ring + center dot —
    the icon that sits beside real bet/pot amounts and must not be read
    as digits (the round-1 '721K' phantom)."""
    h, w = arr.shape
    ys, xs = np.ogrid[:h, :w]
    d2 = (ys - cy) ** 2 + (xs - cx) ** 2
    outer = float(rng.uniform(0.6, 1.0))
    arr[d2 <= rad**2] = outer
    r2 = max(rad - 2, 1)
    arr[d2 <= r2**2] = float(rng.uniform(0.1, 0.4))
    r3 = max(rad // 2, 1)
    arr[d2 <= r3**2] = outer


def render_text(
    rng, text: str, target_w: int, suffix: str = "", img_h: int = crnn.IMG_H
) -> np.ndarray:
    """Render to an (img_h, target_w) float image in [0,1] with augmentation.

    ``suffix`` (if any) is rendered AFTER the text, separated by a chip
    glyph, but is not part of the label — see :func:`random_sample`.
    """
    import cv2
    from PIL import Image, ImageDraw, ImageFilter, ImageFont

    size = int(rng.integers(18, 30))
    font_path = FONTS[rng.integers(0, len(FONTS))]
    key = (font_path, size)
    if key not in _FONT_CACHE:
        _FONT_CACHE[key] = ImageFont.truetype(font_path, size)
    font = _FONT_CACHE[key]

    pad = int(rng.integers(2, 8))
    gap = int(rng.integers(size, 2 * size)) if suffix else 0
    bbox = font.getbbox(text)
    tw = max(1, bbox[2] - bbox[0])
    th = max(1, bbox[3] - bbox[1])
    sw = 0
    if suffix:
        sb = font.getbbox(suffix)
        sw = max(1, sb[2] - sb[0])
    img = Image.new("L", (tw + sw + gap + 2 * pad, th + 2 * pad), 255)
    draw = ImageDraw.Draw(img)
    draw.text((pad - bbox[0], pad - bbox[1]), text, fill=0, font=font)
    if suffix:
        draw.text((pad + tw + gap - sb[0], pad - bbox[1]), suffix, fill=0, font=font)

    if rng.random() < 0.3:
        img = img.filter(ImageFilter.GaussianBlur(float(rng.random()) * 1.2))
    arr = np.asarray(img, np.float32) / 255.0
    # poker UIs are mostly light text on dark chrome: bias polarity flips
    if rng.random() < 0.55:
        arr = 1.0 - arr
    # UI-chrome panel border: light horizontal rule at top/bottom edges
    if rng.random() < 0.3:
        edge = float(rng.uniform(0.5, 1.0))
        if rng.random() < 0.7:
            arr[0 : int(rng.integers(1, 3))] = edge
        if rng.random() < 0.7:
            arr[-int(rng.integers(1, 3)) :] = edge
    # contrast/brightness jitter + noise
    arr = np.clip(arr * rng.uniform(0.6, 1.2) + rng.uniform(-0.15, 0.25), 0, 1)
    if rng.random() < 0.5:
        arr = np.clip(arr + rng.normal(0, rng.uniform(0.01, 0.07), arr.shape), 0, 1)
    # chip glyph between text and suffix (always when a suffix exists),
    # else occasionally at either edge
    h, w = arr.shape
    if suffix:
        frac = (pad + tw + gap // 2) / max(img.size[0], 1)
        _draw_chip(rng, arr, int(frac * w), h // 2, int(rng.integers(h // 3, h // 2)))
    elif rng.random() < 0.2:
        cx = int(rng.integers(0, max(w // 5, 1))) if rng.random() < 0.5 else (
            w - 1 - int(rng.integers(0, max(w // 5, 1)))
        )
        _draw_chip(rng, arr, cx, h // 2 + int(rng.integers(-3, 4)),
                   int(rng.integers(3, max(h // 2, 4))))
    # small-text degradation: downscale then upscale (blurry far-away fields)
    if rng.random() < 0.4:
        sh = int(rng.integers(12, 26))
        sw2 = max(8, int(w * sh / h))
        small = cv2.resize(arr, (sw2, sh), interpolation=cv2.INTER_AREA)
        interp = cv2.INTER_LINEAR if rng.random() < 0.7 else cv2.INTER_CUBIC
        arr = cv2.resize(small, (w, h), interpolation=interp)
    # JPEG artifacts: the reference dataset images are JPEG-compressed
    if rng.random() < 0.5:
        q = int(rng.integers(35, 90))
        ok, enc = cv2.imencode(
            ".jpg", (np.clip(arr, 0, 1) * 255).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, q],
        )
        if ok:
            arr = cv2.imdecode(enc, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    # random edge clipping (tight detector boxes cut glyph edges)
    if rng.random() < 0.3:
        h, w = arr.shape
        cut = int(rng.integers(1, max(w // 12, 2)))
        arr = arr[:, cut:] if rng.random() < 0.5 else arr[:, : w - cut]
    return crnn.preprocess_gray(arr, target_w, img_h=img_h)


@dataclass
class OCRTrainConfig:
    out_path: str = "weights/crnn_synth.npz"
    steps: int = 6000
    batch: int = 64
    width: int = 256
    # input canvas height: 32 = canonical; 64 = high-resolution member (2x
    # glyph pixels, same param tree — crnn.forward pools whatever height
    # remains after the conv stack)
    img_h: int = crnn.IMG_H
    max_label: int = 28
    lr: float = 1e-3
    hidden: int = 256
    seed: int = 0
    eval_every: int = 500
    compute_dtype: str = "float32"
    pool_size: int = 20000  # pre-rendered sample pool (renders off hot loop)
    # real labelled crops (data/ocr_real/labels.json): mixed into batches at
    # real_frac, restricted to real_splits so held-out splits stay eval-only
    real_labels: str = ""
    real_splits: Tuple[str, ...] = ("valid",)
    real_frac: float = 0.35
    # warm-start from an existing checkpoint (fine-tune) instead of random
    # init — geometry (hidden/width/img_h) must match
    init_from: str = ""
    # comma-separated field kinds ('numeric,card') to specialise on: filters
    # BOTH the synthetic pool and the real crops, and is written into the
    # checkpoint meta so the runtime engine gates the member to those kinds
    kinds: str = ""

    def kind_set(self) -> Optional[frozenset]:
        return frozenset(k for k in self.kinds.split(",") if k) or None


def _encode_label(t: str, max_label: int):
    ids = [crnn.char_to_id(c) for c in t][:max_label]
    labels = np.zeros(max_label, np.int32)
    lab_pad = np.ones(max_label, np.float32)
    labels[: len(ids)] = ids
    lab_pad[: len(ids)] = 0.0  # 0 = valid for optax.ctc_loss
    return labels, lab_pad


def make_batch(rng, cfg: OCRTrainConfig):
    imgs = np.zeros((cfg.batch, cfg.img_h, cfg.width, 1), np.float32)
    labels = np.zeros((cfg.batch, cfg.max_label), np.int32)
    lab_pad = np.ones((cfg.batch, cfg.max_label), np.float32)
    texts = []
    for i in range(cfg.batch):
        t, suffix = random_sample(rng, cfg.kind_set())
        t = t[: cfg.max_label]
        texts.append(t)
        imgs[i, :, :, 0] = render_text(rng, t, cfg.width, suffix, cfg.img_h)
        labels[i], lab_pad[i] = _encode_label(t, cfg.max_label)
    return imgs, labels, lab_pad, texts


def build_pool(rng, cfg: OCRTrainConfig, size: int):
    """Pre-render a sample pool so PIL rendering stays off the train loop."""
    imgs = np.zeros((size, cfg.img_h, cfg.width, 1), np.float32)
    labels = np.zeros((size, cfg.max_label), np.int32)
    lab_pad = np.ones((size, cfg.max_label), np.float32)
    texts = []
    kinds = cfg.kind_set()
    for i in range(size):
        t, suffix = random_sample(rng, kinds)
        t = t[: cfg.max_label]
        texts.append(t)
        imgs[i, :, :, 0] = render_text(rng, t, cfg.width, suffix, cfg.img_h)
        labels[i], lab_pad[i] = _encode_label(t, cfg.max_label)
    return imgs, labels, lab_pad, texts


def load_real_pool(cfg: OCRTrainConfig):
    """Labelled REAL crops -> (gray (N,32,W), labels, lab_pad). The label is
    the target VALUE (chip amounts / 'Pot:' prefixes excluded where the
    transcription says so), teaching extraction directly on UI pixels.
    Restricted to cfg.real_splits so the eval sources stay held out."""
    from manual_yolo_tpu.cli.eval_ocr import load_real_crops
    from manual_yolo_tpu.runtime.ocr import OCREngine, field_kind

    kinds = cfg.kind_set()
    grays, labels, pads = [], [], []
    for crop, cname, truth in load_real_crops(
        cfg.real_labels, splits=tuple(cfg.real_splits)
    ):
        if kinds is not None and field_kind(cname) not in kinds:
            continue
        grays.append(
            crnn.preprocess_gray(
                OCREngine._to_gray(crop), cfg.width, img_h=cfg.img_h
            )
        )
        # truth may contain charset-external chars (ellipsis); keep charset only
        t = "".join(c for c in truth if c in crnn.CHARSET)[: cfg.max_label]
        l, p = _encode_label(t, cfg.max_label)
        labels.append(l)
        pads.append(p)
    return np.stack(grays), np.stack(labels), np.stack(pads)


def _device_put_pool_u8(imgs_f32: np.ndarray):
    """Quantise a (N, H, W) float [0,1] image pool to uint8 and upload it
    ONCE as a flat byte buffer (multi-dim uint8 device_put pays a host
    relayout in this environment — docs/BENCH_NOTES.md), reshaping on device.

    Keeping the whole pool resident in HBM is what makes training
    compute-bound: per-step host→device traffic is then just gather indices
    instead of pixel batches (the tunnelled link degrades 30-90x after the
    first conv program, so per-step pixel uploads dominate wall-clock)."""
    u8 = np.clip(imgs_f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    flat = jax.device_put(u8.reshape(-1))
    return jax.jit(lambda b: b.reshape(u8.shape))(flat)


def train_ocr(cfg: OCRTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    params = crnn.init_params(jax.random.PRNGKey(cfg.seed), cfg.hidden)
    if cfg.init_from:
        from manual_yolo_tpu.core.serialization import load_params

        init, imeta = load_params(cfg.init_from)
        want = [x.shape for x in jax.tree_util.tree_leaves(params)]
        got = [x.shape for x in jax.tree_util.tree_leaves(init)]
        if want != got:
            raise ValueError(
                f"init_from {cfg.init_from} geometry mismatch: {imeta}"
            )
        params = init
        log(f"warm-start from {cfg.init_from} ({imeta})")
    sched = optax.warmup_cosine_decay_schedule(
        cfg.lr * 0.05, cfg.lr, min(300, cfg.steps // 5), cfg.steps, cfg.lr * 0.02
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(sched))
    opt_state = tx.init(params)

    t0 = time.time()
    log(f"rendering {cfg.pool_size}-sample pool...")
    p_imgs, p_labels, p_pad, _texts = build_pool(rng, cfg, cfg.pool_size)
    log(f"pool ready in {time.time()-t0:.0f}s")

    r_imgs = rh_imgs = rh_labels = None
    if cfg.real_labels and os.path.exists(cfg.real_labels):
        a_imgs, a_labels, a_pad = load_real_pool(cfg)
        # hold out ~15% of the real pool for checkpoint selection
        hsplit = np.arange(len(a_imgs)) % 7 == 0
        rh_imgs, rh_labels = a_imgs[hsplit], a_labels[hsplit]
        r_imgs, r_labels, r_pad = a_imgs[~hsplit], a_labels[~hsplit], a_pad[~hsplit]
        log(f"real pool: {len(r_imgs)} train + {len(rh_imgs)} holdout crops "
            f"from splits {cfg.real_splits}")

    # --- resident device pools (uint8 pixels, exact labels/pads) -----------
    d_pool = _device_put_pool_u8(p_imgs[..., 0])
    d_labels = jax.device_put(p_labels)
    d_pad = jax.device_put(p_pad)
    have_real = r_imgs is not None and cfg.real_frac > 0 and len(r_imgs) > 0
    k_real = int(cfg.batch * cfg.real_frac) if have_real else 0
    if have_real:
        d_rpool = _device_put_pool_u8(r_imgs)
        d_rlabels = jax.device_put(r_labels)
        d_rpad = jax.device_put(r_pad)
    if rh_imgs is not None and len(rh_imgs):
        d_hold = _device_put_pool_u8(rh_imgs)

    def _augment_real_dev(key, imgs):
        """Device-side photometric jitter for real crops (gentle: they are
        already the target distribution)."""
        kb, kc, kn, kp, ki = jax.random.split(key, 5)
        n = imgs.shape[0]
        gain = jax.random.uniform(kb, (n, 1, 1), minval=0.8, maxval=1.2)
        bias = jax.random.uniform(kc, (n, 1, 1), minval=-0.1, maxval=0.1)
        out = imgs * gain + bias
        noise = jax.random.normal(kn, imgs.shape) * 0.03
        out = out + jnp.where(
            jax.random.uniform(kp, (n, 1, 1)) < 0.3, noise, 0.0
        )
        out = jnp.clip(out, 0.0, 1.0)
        inv = jax.random.uniform(ki, (n, 1, 1)) < 0.25
        return jnp.where(inv, 1.0 - out, out)

    # pools enter the jitted program as ARGUMENTS, never closed-over
    # constants: a captured Array is baked into the HLO as a literal, which
    # bloats the compile payload by the full pool size
    @jax.jit
    def run_chunk(params, opt_state, pools, keys, sidx, ridx):
        """lax.scan over a chunk of steps: ONE dispatch per chunk, so the
        per-call tunnel round trip (~30 ms) amortises."""

        def one_step(carry, inp):
            params, opt_state = carry
            key, sidx1, ridx1 = inp
            imgs = pools["synth"][sidx1].astype(jnp.float32) / 255.0  # (B,H,W)
            labels = pools["labels"][sidx1]
            lab_pad = pools["pad"][sidx1]
            if k_real:
                rimgs = _augment_real_dev(
                    key, pools["real"][ridx1].astype(jnp.float32) / 255.0
                )
                imgs = jnp.concatenate([rimgs, imgs[k_real:]], axis=0)
                labels = jnp.concatenate(
                    [pools["rlabels"][ridx1], labels[k_real:]], axis=0
                )
                lab_pad = jnp.concatenate(
                    [pools["rpad"][ridx1], lab_pad[k_real:]], axis=0
                )
            imgs = imgs[..., None]

            def loss_fn(p):
                logits = crnn.forward(p, imgs, cdt)  # (N, T, C)
                T = logits.shape[1]
                logit_pad = jnp.zeros((logits.shape[0], T), jnp.float32)
                per = optax.ctc_loss(logits, logit_pad, labels, lab_pad)
                return jnp.mean(per)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (keys, sidx, ridx)
        )
        return params, opt_state, losses[-1]

    pools = {"synth": d_pool, "labels": d_labels, "pad": d_pad}
    if have_real:
        pools.update(real=d_rpool, rlabels=d_rlabels, rpad=d_rpad)

    @jax.jit
    def infer(params, imgs):
        from manual_yolo_tpu.ops.ctc import greedy_decode

        return greedy_decode(crnn.forward(params, imgs, cdt))

    def exact_match(params) -> float:
        from manual_yolo_tpu.ops.ctc import decode_to_text

        imgs, labels, lab_pad, texts = make_batch(rng, cfg)
        ids, conf = jax.device_get(infer(params, jnp.asarray(imgs)))
        good = sum(decode_to_text(ids[i]) == texts[i] for i in range(len(texts)))
        return good / len(texts)

    chunk = max(1, cfg.eval_every // 4)
    best_acc = 0.0
    key = jax.random.PRNGKey(cfg.seed)
    s = 0
    while s < cfg.steps:
        n = min(chunk, cfg.steps - s)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n)
        sidx = rng.integers(0, cfg.pool_size, (n, cfg.batch)).astype(np.int32)
        ridx = (
            rng.integers(0, len(r_imgs), (n, max(k_real, 1))).astype(np.int32)
            if have_real
            else np.zeros((n, 1), np.int32)
        )
        params, opt_state, loss = run_chunk(
            params, opt_state, pools, keys, jnp.asarray(sidx), jnp.asarray(ridx)
        )
        s += n
        if s % cfg.eval_every == 0 or s >= cfg.steps:
            acc = exact_match(params)
            real_acc = None
            if rh_imgs is not None and len(rh_imgs):
                from manual_yolo_tpu.ops.ctc import decode_to_text

                ids, _conf = jax.device_get(
                    infer(params, d_hold.astype(jnp.float32)[..., None] / 255.0)
                )
                good = 0
                for i in range(len(rh_imgs)):
                    want = "".join(
                        crnn.CHARSET[c - 1] for c in rh_labels[i] if c > 0
                    )
                    good += int(decode_to_text(ids[i]) == want)
                real_acc = good / len(rh_imgs)
            # selection: worst of synthetic and real-holdout — the checkpoint
            # must read BOTH distributions
            score = acc if real_acc is None else min(acc, real_acc)
            log(
                f"step {s}/{cfg.steps} ctc {float(loss):.3f} "
                f"exact {acc:.3f}"
                + (f" real_holdout {real_acc:.3f}" if real_acc is not None else "")
                + f" ({time.time()-t0:.0f}s)"
            )
            if score >= best_acc:
                best_acc = score
                meta = {"hidden": cfg.hidden, "width": cfg.width,
                        "img_h": cfg.img_h, "exact_match": acc, "step": s}
                if real_acc is not None:
                    meta["real_holdout"] = real_acc
                if cfg.kinds:
                    meta["kinds"] = cfg.kinds
                save_params(cfg.out_path, params, meta=meta)
    return {"best_exact": best_acc, "wall_s": time.time() - t0}

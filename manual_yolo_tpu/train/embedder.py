"""Appearance (re-id) embedder trainer for DeepSORT-style tracking.

The reference's ``deep-sort-realtime`` ships a TRAINED appearance embedder
(mobilenet by default — ``/root/reference/pipe.py:48-51`` constructs
``DeepSort(...)`` whose default ``embedder='mobilenet'`` embeds every
detection crop). Rounds 1-2 stood in with the rank-classifier backbone,
which is discriminative across *rank classes* but unproven on the case a
tracker actually needs: telling apart two same-class, similar-looking UI
elements (two villain name plates, two stacks) across frames.

This trainer produces a purpose-trained embedder with a metric-learning
objective:

- **instances** = labeled boxes of the detection dataset
  (``roadmap1.v3i.yolov8/train``), every class — each box is one identity;
- **views** = tracker-realistic augmentations of an instance crop: bbox
  jitter (the detector's frame-to-frame box noise), photometric
  brightness/contrast/noise (the capture stream's jitter), mild blur — NO
  flips or large rotations (screen UI never mirrors between frames);
- **loss** = NT-Xent (normalised temperature cross entropy) over the 2N
  views of an N-instance batch: both views of an instance are positives,
  all other 2N-2 views are negatives — including same-class instances,
  which is exactly the hard case;
- **backbone** = the YOLOv8n-cls graph we already ship (warm-startable
  from the trained rank classifier), with a small projection MLP used only
  during training (SimCLR-style: runtime matching uses the pre-projection
  pooled features, which is what ``runtime/embedder.AppearanceEmbedder``
  computes).

The checkpoint is written in the classifier-npz layout, so
``AppearanceEmbedder.from_npz`` loads it unchanged.

Evaluation: same-instance vs different-instance verification AUC on the
held-out valid split, reported separately for the all-pairs and the
same-class (hard) pair populations.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manual_yolo_tpu.core.serialization import load_params, save_params
from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.train.data import load_yolo_split


@dataclass
class ReidTrainConfig:
    data_root: str  # YOLO-format dataset root (train/ valid/ splits)
    out_path: str = "weights/reid_embedder.npz"
    epochs: int = 8
    batch: int = 48  # instances per step (2 views each -> 2*batch forward)
    imgsz: int = 64
    lr: float = 5e-4
    weight_decay: float = 1e-4
    temperature: float = 0.1
    proj_dim: int = 128
    scale: str = "n"
    seed: int = 0
    # warm start from the trained rank classifier: its features are a good
    # init and the backbone layout is identical
    init_from_npz: Optional[str] = "weights/rank_classifier_matched.npz"
    min_box: int = 8  # skip degenerate labeled boxes below this pixel size
    context_pad: float = 0.25  # instance context window beyond the box
    compute_dtype: str = "float32"


# ---------------------------------------------------------------------------
# instance extraction + tracker-realistic view sampling


def extract_instances(
    samples, min_box: int = 8, context_pad: float = 0.25, imgsz: int = 64
) -> Tuple[np.ndarray, np.ndarray]:
    """(context windows u8 (N, S, S, 3), class ids (N,)) from labeled boxes.

    Each instance keeps a context window ``(1 + 2*context_pad)`` times its
    box so view sampling can realise bbox jitter by re-cropping INSIDE the
    window instead of re-touching the source image. Windows are resized to
    a fixed canvas (2x the train size, preserving room for shift crops).
    """
    import cv2

    side = imgsz * 2
    crops: List[np.ndarray] = []
    classes: List[int] = []
    for s in samples:
        h, w = s.image.shape[:2]
        for box, cid in zip(s.boxes, s.classes):
            x1, y1, x2, y2 = box
            bw, bh = x2 - x1, y2 - y1
            if bw < min_box or bh < min_box:
                continue
            px, py = bw * context_pad, bh * context_pad
            cx1 = max(int(x1 - px), 0)
            cy1 = max(int(y1 - py), 0)
            cx2 = min(int(x2 + px), w)
            cy2 = min(int(y2 + py), h)
            win = s.image[cy1:cy2, cx1:cx2]
            if win.size == 0:
                continue
            crops.append(
                cv2.resize(win, (side, side), interpolation=cv2.INTER_LINEAR)
            )
            classes.append(int(cid))
    return np.stack(crops), np.asarray(classes, np.int32)


def sample_views(
    rng: np.random.Generator, windows: np.ndarray, imgsz: int = 64
) -> np.ndarray:
    """One tracker-realistic view per context window: a jittered re-crop
    (box noise), photometric jitter (capture noise), occasional blur.
    windows: (N, 2*imgsz, 2*imgsz, 3) u8 -> views (N, imgsz, imgsz, 3)
    float32 RGB in [0, 1] (the runtime embedder's input convention)."""
    import cv2

    n, side = windows.shape[0], windows.shape[1]
    out = np.empty((n, imgsz, imgsz, 3), np.float32)
    # the unjittered box occupies the central (side / (1+2*pad)) region;
    # sample crop side in [0.75, 1.0] of the window and a random offset
    for i in range(n):
        cs = int(side * rng.uniform(0.75, 1.0))
        ox = rng.integers(0, side - cs + 1)
        oy = rng.integers(0, side - cs + 1)
        v = windows[i, oy : oy + cs, ox : ox + cs]
        v = cv2.resize(v, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        if rng.random() < 0.2:
            v = cv2.GaussianBlur(v, (3, 3), 0)
        f = v[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
        # photometric: global gain + per-channel bias + gaussian noise
        f = f * rng.uniform(0.85, 1.15) + rng.uniform(-0.06, 0.06, (1, 1, 3))
        if rng.random() < 0.5:
            f = f + rng.normal(0.0, 0.015, f.shape)
        out[i] = np.clip(f, 0.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# model: classify backbone + training-only projection head


def _init_proj(key, in_dim: int, proj_dim: int):
    k1, k2 = jax.random.split(key)
    s1 = (2.0 / in_dim) ** 0.5
    s2 = (2.0 / in_dim) ** 0.5
    return {
        "w1": jax.random.normal(k1, (in_dim, in_dim), jnp.float32) * s1,
        "b1": jnp.zeros((in_dim,), jnp.float32),
        "w2": jax.random.normal(k2, (in_dim, proj_dim), jnp.float32) * s2,
    }


def _pooled_features(params, spec, x, cdt, bn_ctx=None):
    feats = yolov8.forward_features(params, spec, x, cdt, bn_ctx=bn_ctx)
    return jnp.mean(feats[-1].astype(jnp.float32), axis=(1, 2))


def _project(proj, pooled):
    h = jax.nn.relu(pooled @ proj["w1"] + proj["b1"])
    z = h @ proj["w2"]
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)


def nt_xent_loss(z: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """z: (2N, D) unit vectors, views 2i and 2i+1 are a positive pair."""
    n2 = z.shape[0]
    sim = z @ z.T / temperature
    sim = sim - 1e9 * jnp.eye(n2)  # mask self-similarity
    pos = jnp.arange(n2) ^ 1  # partner index: 2i <-> 2i+1
    return jnp.mean(
        -sim[jnp.arange(n2), pos] + jax.nn.logsumexp(sim, axis=-1)
    )


# ---------------------------------------------------------------------------
# verification evaluation (the tracker's actual decision problem)


def verification_auc(
    embed_fn, windows: np.ndarray, classes: np.ndarray, imgsz: int,
    rng: np.random.Generator, n_neg: int = 4000,
) -> Dict[str, float]:
    """AUC of same-instance vs different-instance cosine similarity.

    Positives: two independent views of the same instance. Negatives:
    views of two different instances — reported for all pairs and for the
    same-class subset (two villain names, two stacks: the pairs DeepSORT's
    cosine gate actually has to split)."""
    va = embed_fn(sample_views(rng, windows, imgsz))
    vb = embed_fn(sample_views(rng, windows, imgsz))
    n = len(windows)
    pos = np.sum(va * vb, axis=-1)

    idx_a = rng.integers(0, n, n_neg)
    idx_b = rng.integers(0, n, n_neg)
    keep = idx_a != idx_b
    idx_a, idx_b = idx_a[keep], idx_b[keep]
    neg = np.sum(va[idx_a] * vb[idx_b], axis=-1)
    same_cls = classes[idx_a] == classes[idx_b]

    def auc(p, q):
        if not len(p) or not len(q):
            return float("nan")
        order = np.concatenate([p, q])
        ranks = order.argsort().argsort()[: len(p)] + 1
        return float(
            (ranks.sum() - len(p) * (len(p) + 1) / 2) / (len(p) * len(q))
        )

    return {
        "auc_all": auc(pos, neg),
        "auc_same_class": auc(pos, neg[same_cls]),
        "pos_mean": float(pos.mean()),
        "neg_mean": float(neg.mean()),
        "neg_same_class_mean": float(neg[same_cls].mean())
        if same_cls.any() else float("nan"),
    }


# ---------------------------------------------------------------------------


def train_embedder(cfg: ReidTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    train = load_yolo_split(cfg.data_root, "train")
    valid = load_yolo_split(cfg.data_root, "valid")
    w_train, c_train = extract_instances(
        train, cfg.min_box, cfg.context_pad, cfg.imgsz
    )
    w_val, c_val = extract_instances(
        valid, cfg.min_box, cfg.context_pad, cfg.imgsz
    )
    log(f"instances: train {len(w_train)}, valid {len(w_val)}")

    # 13 is the rank-classifier head size; the head is unused but keeping
    # the layout identical lets AppearanceEmbedder.from_npz load this
    # checkpoint exactly like a classifier one
    spec = yolov8.build_spec("classify", cfg.scale, 13)
    if cfg.init_from_npz and os.path.exists(cfg.init_from_npz):
        params, _ = load_params(cfg.init_from_npz)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        log(f"warm-started from {cfg.init_from_npz}")
    else:
        params = yolov8.init_params(jax.random.PRNGKey(cfg.seed), spec)

    # probe pooled-feature width for the projection head
    pooled0 = _pooled_features(
        params, spec, jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32), cdt
    )
    proj = _init_proj(jax.random.PRNGKey(cfg.seed + 1), pooled0.shape[-1],
                      cfg.proj_dim)

    steps_per_epoch = max(1, len(w_train) // cfg.batch)
    total_steps = steps_per_epoch * cfg.epochs
    sched = optax.warmup_cosine_decay_schedule(
        init_value=cfg.lr * 0.05, peak_value=cfg.lr,
        warmup_steps=max(total_steps // 20, 1), decay_steps=total_steps,
        end_value=cfg.lr * 0.02,
    )
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    state = (params, proj)
    opt_state = tx.init(state)

    @jax.jit
    def train_step(state, opt_state, views):
        def loss_fn(st):
            p, pr = st
            ctx = yolov8.BNCtx()
            pooled = _pooled_features(p, spec, views, cdt, bn_ctx=ctx)
            z = _project(pr, pooled)
            return nt_xent_loss(z, cfg.temperature), ctx.updates

        (loss, bn_updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        p, pr = optax.apply_updates(state, updates)
        p = yolov8.apply_bn_updates(p, bn_updates)
        return (p, pr), opt_state, loss

    @jax.jit
    def eval_pooled(params, x):
        pooled = _pooled_features(params, spec, x, cdt)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6
        )

    def embed_np(params):
        def fn(views):
            return np.asarray(eval_pooled(params, jnp.asarray(views)))
        return fn

    eval_rng = np.random.default_rng(1234)
    base = verification_auc(
        embed_np(state[0]), w_val, c_val, cfg.imgsz,
        np.random.default_rng(1234)
    )
    log(f"pre-train verification: {base}")

    def _score(m: Dict[str, float]) -> float:
        # NaN-safe checkpoint score (NaN >= x is False, which would
        # silently skip every save): prefer the hard same-class AUC, fall
        # back to all-pairs when no same-class negative pair was sampled
        for k in ("auc_same_class", "auc_all"):
            v = m.get(k, float("nan"))
            if v == v:
                return float(v)
        return 0.0

    t0 = time.time()
    best = dict(base)
    # seed the save threshold BELOW any real score: the best TRAINED epoch
    # is always checkpointed, even when it never beats the warm-start AUC
    best_score = -float("inf")
    for epoch in range(cfg.epochs):
        perm = rng.permutation(len(w_train))
        ep_loss, nst = 0.0, 0
        for s in range(steps_per_epoch):
            idx = perm[s * cfg.batch : (s + 1) * cfg.batch]
            win = w_train[idx]
            va = sample_views(rng, win, cfg.imgsz)
            vb = sample_views(rng, win, cfg.imgsz)
            # interleave so views 2i, 2i+1 pair up
            views = np.empty(
                (2 * len(win), cfg.imgsz, cfg.imgsz, 3), np.float32
            )
            views[0::2], views[1::2] = va, vb
            state, opt_state, loss = train_step(
                state, opt_state, jnp.asarray(views)
            )
            ep_loss += float(loss)
            nst += 1
        m = verification_auc(
            embed_np(state[0]), w_val, c_val, cfg.imgsz,
            np.random.default_rng(1234)
        )
        log(f"epoch {epoch + 1}/{cfg.epochs} loss {ep_loss / max(nst, 1):.4f} "
            f"auc_all {m['auc_all']:.4f} auc_same_class "
            f"{m['auc_same_class']:.4f} ({time.time() - t0:.0f}s)")
        if _score(m) >= best_score:
            best_score = _score(m)
            best = dict(m)
            os.makedirs(os.path.dirname(cfg.out_path) or ".", exist_ok=True)
            save_params(
                cfg.out_path, state[0],
                meta={
                    "spec": {"variant": "classify", "scale": cfg.scale,
                             "nc": 13},
                    "type": "reid_embedder",
                    "objective": "nt_xent",
                    "imgsz": cfg.imgsz,
                    "metrics": {k: round(v, 4) for k, v in m.items()},
                    "pre_train": {k: round(v, 4) for k, v in base.items()},
                },
            )
    best["pre_auc_all"] = base["auc_all"]
    best["pre_auc_same_class"] = base["auc_same_class"]
    return best

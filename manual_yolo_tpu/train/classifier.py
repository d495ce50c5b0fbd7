"""Rank-classifier trainer — TPU-native equivalent of reference ``class.py``.

Reference behaviour (``class.py:22-31`` + ``runs/rank_classifier/args.yaml``):
fine-tune yolov8n-cls on the ``rank_classifier`` folder dataset, epochs 50,
imgsz 64, batch 64, patience 10 (early stop), fliplr 0.5, erasing 0.4; the
observed run stopped at epoch 21 with best top-1 0.9403.

Here: a jit-compiled train step (forward with batch-stat BN + cross-entropy,
optax AdamW with warmup + cosine decay), full-dataset in-memory pipeline,
early stopping on validation top-1, best checkpoint promoted to a fixed path
(the ``best.pt`` -> ``rank_classifier.pt`` copy of ``class.py:34-37``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manual_yolo_tpu.core.serialization import load_params, save_params
from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.train.data import augment_classify_batch, load_classify_folder


@dataclass
class ClsTrainConfig:
    data_root: str
    out_path: str = "runs_tpu/rank_classifier/best.npz"
    epochs: int = 50
    batch: int = 64
    imgsz: int = 64
    patience: int = 10
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    label_smoothing: float = 0.0
    scale: str = "n"
    seed: int = 0
    init_from: Optional[str] = None  # optional .pt to warm-start from
    init_from_npz: Optional[str] = None  # optional native checkpoint warm start
    # optional distribution-matched crops (train/matched_crops.py): co-trained
    # with the folder dataset and evaluated as a second validation axis
    matched_npz: Optional[str] = None
    compute_dtype: str = "float32"


def _partition_decay(params):
    """Weight decay on conv/linear weights only (not BN/bias), as ultralytics."""

    def rec(p, under_bn=False):
        if isinstance(p, dict):
            return {
                k: rec(v, under_bn or k == "bn")
                for k, v in p.items()
            }
        if isinstance(p, list):
            return [rec(v, under_bn) for v in p]
        return "no_decay" if under_bn else "decay"

    labels = [rec(p) for p in params]

    # biases ('b') and linear biases should not decay; fix up leaf labels
    def fix(p, l):
        if isinstance(p, dict):
            return {
                k: ("no_decay" if k in ("b", "bias") else fix(p[k], l[k]))
                for k in p
            }
        if isinstance(p, list):
            return [fix(a, b) for a, b in zip(p, l)]
        return l

    return [fix(p, l) for p, l in zip(params, labels)]


def train_classifier(cfg: ClsTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    x_train, y_train, names = load_classify_folder(
        os.path.join(cfg.data_root, "train"), cfg.imgsz
    )
    x_val, y_val, names_v = load_classify_folder(
        os.path.join(cfg.data_root, "valid"), cfg.imgsz
    )
    assert names == names_v, "train/valid class folders differ"
    nc = len(names)
    x_val_m = y_val_m = None
    if cfg.matched_npz:
        from manual_yolo_tpu.train.matched_crops import load_matched_dataset

        matched, names_m = load_matched_dataset(cfg.matched_npz)
        assert names == names_m, "matched dataset class order differs"
        xm, ym = matched["train"]
        x_train = np.concatenate([x_train, xm])
        y_train = np.concatenate([y_train, ym])
        if "valid" in matched:
            x_val_m, y_val_m = matched["valid"]
        log(f"co-training with {len(xm)} matched crops "
            f"(+{len(x_val_m) if x_val_m is not None else 0} matched valid)")
    log(f"train {len(x_train)} imgs, valid {len(x_val)} imgs, {nc} classes")

    spec = yolov8.build_spec("classify", cfg.scale, nc)
    if cfg.init_from:
        from manual_yolo_tpu.core.weights import load_torch_checkpoint

        ckpt = load_torch_checkpoint(cfg.init_from)
        params = yolov8.import_torch_state(ckpt.state, spec, fold=False)
    elif cfg.init_from_npz:
        params, _meta = load_params(cfg.init_from_npz)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        log(f"warm-started from {cfg.init_from_npz}")
    else:
        params = yolov8.init_params(jax.random.PRNGKey(cfg.seed), spec)

    steps_per_epoch = max(1, len(x_train) // cfg.batch)
    total_steps = steps_per_epoch * cfg.epochs
    warmup_steps = min(int(cfg.warmup_epochs * steps_per_epoch), max(total_steps // 3, 1))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=cfg.lr * 0.01,
        peak_value=cfg.lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=cfg.lr * 0.01,
    )
    tx = optax.multi_transform(
        {
            "decay": optax.adamw(sched, weight_decay=cfg.weight_decay),
            "no_decay": optax.adamw(sched, weight_decay=0.0),
        },
        _partition_decay(params),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            ctx = yolov8.BNCtx()
            logits = yolov8.forward_classify(p, spec, x, cdt, bn_ctx=ctx)
            labels = jax.nn.one_hot(y, nc)
            if cfg.label_smoothing:
                labels = (
                    labels * (1 - cfg.label_smoothing) + cfg.label_smoothing / nc
                )
            loss = jnp.mean(
                optax.softmax_cross_entropy(logits, labels)
            )
            return loss, ctx.updates

        (loss, bn_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = yolov8.apply_bn_updates(params, bn_updates)
        return params, opt_state, loss

    @jax.jit
    def eval_logits(params, x):
        return yolov8.forward_classify(params, spec, x, cdt)

    def evaluate(params) -> Tuple[float, float]:
        logits = np.asarray(eval_logits(params, jnp.asarray(x_val)))
        top1 = float(np.mean(logits.argmax(-1) == y_val))
        top5 = float(
            np.mean([y in row.argsort()[-5:] for y, row in zip(y_val, logits)])
        )
        return top1, top5

    def evaluate_matched(params) -> Optional[float]:
        if x_val_m is None:
            return None
        logits = np.asarray(eval_logits(params, jnp.asarray(x_val_m)))
        return float(np.mean(logits.argmax(-1) == y_val_m))

    def confusion(params) -> np.ndarray:
        logits = np.asarray(eval_logits(params, jnp.asarray(x_val)))
        pred = logits.argmax(-1)
        m = np.zeros((nc, nc), np.int32)
        for t, p in zip(y_val, pred):
            m[t, p] += 1
        return m

    best_top1, best_epoch, t0 = -1.0, -1, time.time()
    history = []
    for epoch in range(cfg.epochs):
        perm = rng.permutation(len(x_train))
        ep_loss = 0.0
        for s in range(steps_per_epoch):
            idx = perm[s * cfg.batch : (s + 1) * cfg.batch]
            xb = augment_classify_batch(rng, x_train[idx])
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(xb), jnp.asarray(y_train[idx])
            )
            ep_loss += float(loss)
        top1, top5 = evaluate(params)
        top1_m = evaluate_matched(params)
        # selection score: worst of the two validation distributions, so the
        # promoted checkpoint can't trade folder-crop parity for matched-crop
        # accuracy (or vice versa)
        score = top1 if top1_m is None else min(top1, top1_m)
        history.append({"epoch": epoch + 1, "loss": ep_loss / steps_per_epoch,
                        "top1": top1, "top5": top5, "top1_matched": top1_m})
        log(
            f"epoch {epoch+1}/{cfg.epochs} loss {ep_loss/steps_per_epoch:.4f} "
            f"top1 {top1:.4f} top5 {top5:.4f}"
            + (f" top1_matched {top1_m:.4f}" if top1_m is not None else "")
            + f" ({time.time()-t0:.1f}s)"
        )
        if score > best_top1:
            best_top1, best_epoch = score, epoch
            meta = {
                "names": {i: n for i, n in enumerate(names)},
                "spec": {"variant": "classify", "scale": cfg.scale, "nc": nc},
                "top1": top1,
                "top5": top5,
                "epoch": epoch + 1,
            }
            if top1_m is not None:
                meta["top1_matched"] = top1_m
            save_params(cfg.out_path, params, meta=meta)
        if epoch - best_epoch >= cfg.patience:
            log(f"early stop at epoch {epoch+1} (best {best_top1:.4f} @ {best_epoch+1})")
            break

    # training artifacts, mirroring the reference run directory
    # (runs/rank_classifier/{args.yaml,results.csv,confusion_matrix})
    import dataclasses
    import json

    run_dir = os.path.dirname(os.path.abspath(cfg.out_path))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "args.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    with open(os.path.join(run_dir, "results.csv"), "w") as f:
        f.write("epoch,train_loss,top1,top5,top1_matched\n")
        for h in history:
            m = h.get("top1_matched")
            f.write(
                f"{h['epoch']},{h['loss']:.5f},{h['top1']:.5f},{h['top5']:.5f},"
                + (f"{m:.5f}\n" if m is not None else "\n")
            )
    best_params, _ = load_params(cfg.out_path)
    best_params = jax.tree_util.tree_map(jnp.asarray, best_params)
    cm = confusion(best_params)
    np.savetxt(
        os.path.join(run_dir, "confusion_matrix.csv"), cm, fmt="%d", delimiter=",",
        header=",".join(names), comments="",
    )
    return {
        "best_top1": best_top1,
        "best_epoch": best_epoch + 1,
        "wall_s": time.time() - t0,
        "history": history,
    }

"""Detector trainer — produces the task weights the reference lacks.

``poker_model.pt`` is referenced everywhere in the reference
(``detect.py:13``, ``pipe.py:34``, ``yolo.py:28``) but absent from its repo
(SURVEY.md §2a), so the TPU framework trains its own detector on the
included 200-image Roboflow dataset (``roadmap1.v3i.yolov8``).

jit-compiled train step = forward (train-mode BN) + TAL/CIoU/DFL loss +
AdamW + EMA, all on device; host does decode/augment only. Optional
data-parallel sharding over a device mesh lives in parallel/trainer.py.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from manual_yolo_tpu.core.serialization import load_params, save_params
from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.ops import nms as nms_ops
from manual_yolo_tpu.train import data as data_lib
from manual_yolo_tpu.train.ema import ema_update
from manual_yolo_tpu.train.loss import detection_loss
from manual_yolo_tpu.train.metrics import mean_average_precision


@dataclass
class DetTrainConfig:
    data_root: str
    out_path: str = "runs_tpu/detector/best.npz"
    epochs: int = 150
    batch: int = 16
    imgsz: int = 640
    max_boxes: int = 160
    patience: int = 50
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    close_mosaic: int = 10
    scale: str = "n"
    seed: int = 0
    steps_per_epoch: Optional[int] = None
    compute_dtype: str = "bfloat16"
    eval_every: int = 5
    conf_eval: float = 0.001
    # resume an interrupted run from last_<scale>.npz next to out_path
    # (ultralytics `resume` semantics, reference args.yaml:27)
    resume: bool = False


def _decode_eval(det: nms_ops.Detections) -> Dict[str, np.ndarray]:
    det = jax.device_get(det)
    n = int(det.count)
    return {
        "boxes": np.asarray(det.boxes[:n]),
        "scores": np.asarray(det.scores[:n]),
        "classes": np.asarray(det.classes[:n]),
    }


def evaluate_detector(
    params, spec, samples, imgsz, conf=0.001, iou=0.7, batch=8, compute_dtype=jnp.float32
) -> Dict[str, float]:
    """mAP on letterboxed canvases (GT mapped into canvas space)."""
    imgs, tgts, tmask, _ = data_lib.make_eval_batch(samples, imgsz)

    @jax.jit
    def run(params, x):
        raw = yolov8.forward_detect_raw(params, spec, x, compute_dtype)
        boxes, scores = yolov8.decode_boxes(raw, (imgsz, imgsz), spec.strides)
        return jax.vmap(
            lambda b, s: nms_ops.nms(b, s, conf_thres=conf, iou_thres=iou,
                                     pre_nms=512, max_det=300)
        )(boxes, scores)

    preds, gts = [], []
    for i in range(0, len(imgs), batch):
        xb = imgs[i : i + batch]
        pad = batch - len(xb)
        if pad:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
        det = run(params, jnp.asarray(xb))
        for j in range(len(imgs[i : i + batch])):
            preds.append(
                _decode_eval(
                    nms_ops.Detections(
                        det.boxes[j], det.scores[j], det.classes[j], det.count[j]
                    )
                )
            )
    for bi in range(len(imgs)):
        m = tmask[bi]
        gts.append({"boxes": tgts[bi, m, 1:], "classes": tgts[bi, m, 0].astype(int)})
    return mean_average_precision(preds, gts)


def train_detector(cfg: DetTrainConfig, log=print) -> Dict[str, float]:
    rng = np.random.default_rng(cfg.seed)
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    # pre-downscale to ~1.5x the train canvas: mosaic sources never need more
    train_samples = data_lib.load_yolo_split(
        cfg.data_root, "train", max_side=cfg.imgsz * 3 // 2
    )
    val_samples = data_lib.load_yolo_split(cfg.data_root, "valid")
    names = data_lib.load_yolo_names(cfg.data_root)
    nc = len(names)
    log(f"train {len(train_samples)} imgs, valid {len(val_samples)} imgs, {nc} classes")

    spec = yolov8.build_spec("detect", cfg.scale, nc)
    params = yolov8.init_params(jax.random.PRNGKey(cfg.seed), spec)
    ema_params = jax.tree_util.tree_map(lambda x: x, params)

    steps_per_epoch = cfg.steps_per_epoch or max(1, len(train_samples) // cfg.batch)
    total_steps = steps_per_epoch * cfg.epochs
    warmup = min(int(cfg.warmup_epochs * steps_per_epoch), max(total_steps // 3, 1))
    sched = optax.warmup_cosine_decay_schedule(
        cfg.lr * 0.01, cfg.lr, warmup, total_steps, cfg.lr * 0.01
    )
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )
    opt_state = tx.init(params)

    last_path = os.path.join(
        os.path.dirname(os.path.abspath(cfg.out_path)), f"last_{cfg.scale}.npz"
    )
    start_epoch, step = 0, 0
    best_map, best_epoch = -1.0, -1
    if cfg.resume and os.path.exists(last_path):
        # the serializer stores pytrees as plain containers; optimizer state
        # is restored leaf-wise into a freshly-built tx.init structure
        ckpt, cmeta = load_params(last_path, dtype=None)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["params"])
        ema_params = jax.tree_util.tree_map(jnp.asarray, ckpt["ema"])
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state),
            [jnp.asarray(l) for l in jax.tree_util.tree_leaves(ckpt["opt"])],
        )
        start_epoch = int(cmeta["epoch"])
        step = int(cmeta["step"])
        best_map = float(cmeta["best_map"])
        best_epoch = int(cmeta["best_epoch"])
        log(
            f"resumed from {last_path}: epoch {start_epoch}, step {step}, "
            f"best map50 {best_map:.4f} @ {best_epoch+1}"
        )

    def save_last(epoch_done: int):
        # full-precision snapshot: fp16 would corrupt Adam moments
        save_params(
            last_path,
            {
                "params": params,
                "ema": ema_params,
                "opt": list(jax.tree_util.tree_leaves(opt_state)),
            },
            meta={
                "epoch": epoch_done,
                "step": step,
                "best_map": best_map,
                "best_epoch": best_epoch,
                "spec": {"variant": "detect", "scale": cfg.scale, "nc": nc},
                "names": {int(k): v for k, v in names.items()},
            },
            dtype=None,
        )

    @jax.jit
    def train_step(params, ema_params, opt_state, step, x, t, m):
        def loss_fn(p):
            ctx = yolov8.BNCtx()
            loss, aux = detection_loss(p, spec, x, t, m, cdt, bn_ctx=ctx)
            return loss, (aux, ctx.updates)

        (loss, (aux, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = yolov8.apply_bn_updates(params, bn_updates)
        ema_params = ema_update(ema_params, params, step)
        return params, ema_params, opt_state, loss, aux

    # background batch producer: overlap host augmentation with device steps
    import queue as queue_mod
    import threading

    batch_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=4)
    stop_flag = threading.Event()
    mosaic_flag = threading.Event()
    mosaic_flag.set()

    def producer(idx: int):
        # distinct stream per thread, else all producers emit identical batches
        prng = np.random.default_rng(cfg.seed + 1 + idx)
        while not stop_flag.is_set():
            b = data_lib.make_detect_batch(
                prng, train_samples, cfg.batch, cfg.imgsz, cfg.max_boxes,
                mosaic=mosaic_flag.is_set(),
            )
            while not stop_flag.is_set():
                try:
                    batch_q.put(b, timeout=0.5)
                    break
                except queue_mod.Full:
                    continue

    producer_threads = [
        threading.Thread(target=producer, args=(i,), daemon=True)
        for i in range(4)
    ]
    for th in producer_threads:
        th.start()

    t0 = time.time()
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        mosaic_on = epoch < cfg.epochs - cfg.close_mosaic
        if mosaic_on:
            mosaic_flag.set()
        else:
            mosaic_flag.clear()
        ep = {"loss": 0.0, "box": 0.0, "cls": 0.0, "dfl": 0.0}
        for _ in range(steps_per_epoch):
            x, t, m = batch_q.get()
            params, ema_params, opt_state, loss, aux = train_step(
                params, ema_params, opt_state, jnp.asarray(step, jnp.int32),
                jnp.asarray(x), jnp.asarray(t), jnp.asarray(m),
            )
            step += 1
            ep["loss"] += float(loss)
            for k in ("box", "cls", "dfl"):
                ep[k] += float(aux[k])
        for k in ep:
            ep[k] /= steps_per_epoch

        line = (
            f"epoch {epoch+1}/{cfg.epochs} loss {ep['loss']:.3f} "
            f"(box {ep['box']:.3f} cls {ep['cls']:.3f} dfl {ep['dfl']:.3f})"
        )
        if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1:
            m50 = evaluate_detector(
                yolov8.fold_params(ema_params, spec), spec, val_samples,
                cfg.imgsz, cfg.conf_eval, compute_dtype=cdt,
            )
            line += f" map50 {m50['map50']:.4f} map50-95 {m50['map50_95']:.4f}"
            history.append({"epoch": epoch + 1, **ep, **m50})
            if m50["map50"] > best_map:
                best_map, best_epoch = m50["map50"], epoch
                save_params(
                    cfg.out_path,
                    ema_params,
                    meta={
                        "names": {int(k): v for k, v in names.items()},
                        "spec": {"variant": "detect", "scale": cfg.scale, "nc": nc},
                        "map50": m50["map50"],
                        "map50_95": m50["map50_95"],
                        "epoch": epoch + 1,
                        "imgsz": cfg.imgsz,
                    },
                )
            if epoch - best_epoch >= cfg.patience:
                log(line)
                log(f"early stop (best map50 {best_map:.4f} @ epoch {best_epoch+1})")
                save_last(epoch + 1)
                break
        save_last(epoch + 1)
        log(line + f" ({time.time()-t0:.0f}s)")
    stop_flag.set()
    # artifacts next to the checkpoint (args + per-eval metrics)
    import dataclasses
    import json

    run_dir = os.path.dirname(os.path.abspath(cfg.out_path))
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, f"args_{cfg.scale}.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    with open(os.path.join(run_dir, f"results_{cfg.scale}.csv"), "w") as f:
        f.write("epoch,loss,box,cls,dfl,map50,map50_95\n")
        for h in history:
            f.write(
                f"{h['epoch']},{h['loss']:.5f},{h['box']:.5f},{h['cls']:.5f},"
                f"{h['dfl']:.5f},{h['map50']:.5f},{h['map50_95']:.5f}\n"
            )
    return {
        "best_map50": best_map,
        "best_epoch": best_epoch + 1,
        "wall_s": time.time() - t0,
        "history": history,
    }

"""Static-shape, on-device NMS.

The reference delegates NMS to torchvision's CUDA/C++ kernel inside
ultralytics postprocess (SURVEY.md §2b names the Pallas NMS replacement
explicitly). Here it is a fixed-shape XLA program:

  1. per-anchor best class (multi_label off, matching ultralytics default),
  2. confidence gate,
  3. top-K pre-selection (static K),
  4. greedy class-aware suppression via a sequential scan over the
     precomputed IoU matrix (class separation by the coordinate-offset trick,
     identical in effect to per-class NMS),
  5. fixed MAX_DET output, padded, with a validity mask.

Everything is static-shaped so the whole detect->NMS program compiles once.
The O(K^2) IoU matrix is tiny at K<=512 and maps well onto the VPU; a Pallas
fused variant lives in ops/pallas_nms.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from manual_yolo_tpu.ops.boxes import pairwise_iou

MAX_WH = 7680.0  # class-offset multiplier (any value larger than image side)


class Detections(NamedTuple):
    """Fixed-size detection set. Invalid slots have score 0 and class -1."""

    boxes: jnp.ndarray  # (MAX_DET, 4) xyxy, image pixels
    scores: jnp.ndarray  # (MAX_DET,)
    classes: jnp.ndarray  # (MAX_DET,) int32, -1 for padding
    count: jnp.ndarray  # () int32 number of valid detections


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    pre_nms: int = 512,
    max_det: int = 300,
    class_aware: bool = True,
    use_pallas: bool = False,
) -> Detections:
    """boxes (A,4) xyxy, scores (A,nc) -> fixed-size Detections.

    Matches ultralytics ``non_max_suppression`` defaults (conf 0.25, iou 0.7,
    max_det 300, class-aware) as used by the reference's ``model(frame)``
    calls.
    """
    num_classes = scores.shape[-1]
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    conf = jnp.max(scores, axis=-1)
    valid = conf > conf_thres
    conf = jnp.where(valid, conf, 0.0)

    k = min(pre_nms, boxes.shape[0])
    top_conf, top_idx = jax.lax.top_k(conf, k)
    top_boxes = boxes[top_idx]
    top_cls = cls[top_idx]
    top_valid = top_conf > conf_thres

    if class_aware:
        off = top_cls.astype(boxes.dtype)[:, None] * MAX_WH
        nms_boxes = top_boxes + off
    else:
        nms_boxes = top_boxes

    if use_pallas:
        from manual_yolo_tpu.ops.pallas_nms import pallas_nms_keep

        kept = pallas_nms_keep(nms_boxes, top_valid, iou_thres)
    else:
        iou = pairwise_iou(nms_boxes, nms_boxes)
        over = (iou > iou_thres) & ~jnp.eye(k, dtype=bool)

        def body(i, kept):
            # keep i iff valid and no higher-scored kept box overlaps it
            suppressed = jnp.any(kept & over[:, i])
            keep_i = top_valid[i] & ~suppressed
            return kept.at[i].set(keep_i)

        kept = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))

    out_conf = jnp.where(kept, top_conf, 0.0)
    m = min(max_det, k)
    sel_conf, sel = jax.lax.top_k(out_conf, m)
    sel_valid = sel_conf > 0.0
    det_boxes = jnp.where(sel_valid[:, None], top_boxes[sel], 0.0)
    det_cls = jnp.where(sel_valid, top_cls[sel], -1)
    if m < max_det:
        pad = max_det - m
        det_boxes = jnp.pad(det_boxes, ((0, pad), (0, 0)))
        sel_conf = jnp.pad(sel_conf, (0, pad))
        det_cls = jnp.pad(det_cls, (0, pad), constant_values=-1)
    return Detections(
        boxes=det_boxes,
        scores=sel_conf,
        classes=det_cls,
        count=jnp.sum(sel_valid.astype(jnp.int32)),
    )


def nms_reference_numpy(boxes, scores, conf_thres=0.25, iou_thres=0.7, class_aware=True):
    """Plain-python greedy NMS oracle for tests (not used at runtime)."""
    import numpy as np

    cls = scores.argmax(-1)
    conf = scores.max(-1)
    order = np.argsort(-conf)
    keep = []
    for i in order:
        if conf[i] <= conf_thres:
            continue
        bi = boxes[i] + (cls[i] * MAX_WH if class_aware else 0)
        ok = True
        for j in keep:
            bj = boxes[j] + (cls[j] * MAX_WH if class_aware else 0)
            x1 = max(bi[0], bj[0]); y1 = max(bi[1], bj[1])
            x2 = min(bi[2], bj[2]); y2 = min(bi[3], bj[3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / (a + b - inter + 1e-7) > iou_thres:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep

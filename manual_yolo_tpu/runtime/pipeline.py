"""Fused frame pipeline: capture frame -> game-field readings in ONE program.

This is the TPU answer to the reference's central performance bug: its live
loop makes 1 detector call + up to 7 SERIAL classifier calls + ~3N OCR calls
per frame, each a separate host<->device round trip (SURVEY.md §3.1 "all
single-image, unbatched"). Here a single jitted XLA program does:

  uint8 frame -> letterbox -> YOLOv8 detect -> NMS ->
  select top-K rank-class detections -> gather 64x64 crops ON DEVICE
  (bilinear, shortest-side-scale + center-crop semantics, pad=6 like the
  reference's safe_crop detect.py:100-113) -> batched rank classifier ->
  (detections, per-slot rank probabilities)

One host->device upload (the frame), one download (fixed-size results).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.game import taxonomy
from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.ops import nms as nms_ops
from manual_yolo_tpu.ops.letterbox import letterbox, unletterbox_boxes


class FrameResult(NamedTuple):
    boxes: jnp.ndarray  # (MAX_DET, 4) xyxy source pixels
    scores: jnp.ndarray  # (MAX_DET,)
    classes: jnp.ndarray  # (MAX_DET,) int32 (-1 pad)
    count: jnp.ndarray  # () int32
    rank_det_idx: jnp.ndarray  # (MAX_RANK,) index into boxes (-1 pad)
    rank_probs: jnp.ndarray  # (MAX_RANK, n_rank_classes)


def crop_resize_center(
    frame: jnp.ndarray, box: jnp.ndarray, out_size: int, pad: float
) -> jnp.ndarray:
    """Bilinear-sample a box from (H, W, 3) frame into (out, out, 3).

    Semantics match the classifier's host preprocessing: scale so the box's
    SHORT side maps to ``out_size`` and center-crop the long side.
    """
    H, W = frame.shape[0], frame.shape[1]
    x1, y1, x2, y2 = box[0] - pad, box[1] - pad, box[2] + pad, box[3] + pad
    w = jnp.maximum(x2 - x1, 1.0)
    h = jnp.maximum(y2 - y1, 1.0)
    step = jnp.minimum(w, h) / out_size  # source pixels per output pixel
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    idx = (jnp.arange(out_size, dtype=jnp.float32) - (out_size - 1) / 2.0) * step
    xs = jnp.clip(cx + idx, 0.0, W - 1.0)
    ys = jnp.clip(cy + idx, 0.0, H - 1.0)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, W - 1)
    y1i = jnp.minimum(y0 + 1, H - 1)
    fx = (xs - x0)[None, :, None]
    fy = (ys - y0)[:, None, None]
    f = frame.astype(jnp.float32)
    tl = f[y0[:, None], x0[None, :]]
    tr = f[y0[:, None], x1i[None, :]]
    bl = f[y1i[:, None], x0[None, :]]
    br = f[y1i[:, None], x1i[None, :]]
    top = tl * (1 - fx) + tr * fx
    bot = bl * (1 - fx) + br * fx
    return top * (1 - fy) + bot * fy


@dataclass
class FusedPipeline:
    """Detector + rank classifier fused into one jitted program per shape."""

    det_params: object
    det_spec: yolov8.ModelSpec
    cls_params: object
    cls_spec: yolov8.ModelSpec
    names: Dict[int, str]
    rank_names: Dict[int, str]
    imgsz: int = 640
    conf: float = 0.25
    iou: float = 0.7
    max_det: int = 300
    max_rank: int = 8
    crop_pad: float = 6.0
    compute_dtype: object = jnp.bfloat16

    def __post_init__(self):
        self._rank_class_ids = jnp.asarray(
            [i for i, n in self.names.items() if n in taxonomy.RANK_CLASSES],
            jnp.int32,
        )
        self._compiled = {}

    def _build(self, src_hw: Tuple[int, int]):
        H = W = self.imgsz

        def run(det_params, cls_params, frame):
            rgb = frame[..., ::-1]
            canvas, ratio, padlt = letterbox(rgb, (H, W), scaleup=True)
            raw = yolov8.forward_detect_raw(
                det_params, self.det_spec, canvas[None], self.compute_dtype
            )
            boxes, scores = yolov8.decode_boxes(raw, (H, W), self.det_spec.strides)
            det = nms_ops.nms(
                boxes[0], scores[0], conf_thres=self.conf, iou_thres=self.iou,
                pre_nms=512, max_det=self.max_det,
            )
            src_boxes = unletterbox_boxes(det.boxes, ratio, padlt, src_hw)
            src_boxes = jnp.where(det.scores[:, None] > 0, src_boxes, 0.0)

            # select top-K rank-class detections
            is_rank = jnp.any(
                det.classes[:, None] == self._rank_class_ids[None, :], axis=1
            )
            rank_score = jnp.where(is_rank, det.scores, 0.0)
            top_scores, top_idx = jax.lax.top_k(rank_score, self.max_rank)
            valid = top_scores > 0.0
            rank_det_idx = jnp.where(valid, top_idx, -1)

            crop_boxes = src_boxes[top_idx]
            crops = jax.vmap(
                lambda b: crop_resize_center(rgb, b, 64, self.crop_pad)
            )(crop_boxes)
            crops = crops / 255.0
            # classifier runs f32: it is tiny (<0.1 ms) and bf16 flips
            # borderline rank reads near the confidence thresholds
            logits = yolov8.forward_classify(
                cls_params, self.cls_spec, crops, jnp.float32
            )
            probs = jax.nn.softmax(logits, axis=-1)
            probs = jnp.where(valid[:, None], probs, 0.0)
            return FrameResult(
                src_boxes, det.scores, det.classes, det.count, rank_det_idx, probs
            )

        return jax.jit(run)

    def __call__(self, frame_bgr: np.ndarray) -> FrameResult:
        key = frame_bgr.shape[:2]
        if key not in self._compiled:
            self._compiled[key] = self._build(key)
        return self._compiled[key](self.det_params, self.cls_params, jnp.asarray(frame_bgr))

    # ------------------------------------------------------------------
    def process_frame(self, frame_bgr: np.ndarray) -> List[Dict]:
        """Host-friendly per-detection list with rank text resolved.

        Equivalent surface to the reference's per-frame loop output
        (``detect.py:580-600``): class_name, bbox, conf and, for rank
        classes, the classifier's reading (threshold 0.40, or 0.20 for
        turn/river — reference detect.py:127-131).
        """
        from manual_yolo_tpu.game.text import normalize_rank_text, VALID_CARD_RANKS

        res = jax.device_get(self(frame_bgr))
        n = int(res.count)
        dets: List[Dict] = []
        for i in range(n):
            cid = int(res.classes[i])
            x1, y1, x2, y2 = (int(v) for v in res.boxes[i])
            dets.append(
                {
                    "class_id": cid,
                    "class_name": self.names.get(cid, f"class{cid}"),
                    "bbox": [x1, y1, x2, y2],
                    "conf": round(float(res.scores[i]), 3),
                    "ocr_text": "",
                }
            )
        for slot in range(len(res.rank_det_idx)):
            di = int(res.rank_det_idx[slot])
            if di < 0 or di >= n:
                continue
            probs = res.rank_probs[slot]
            top = int(np.argmax(probs))
            conf = float(probs[top])
            cname = dets[di]["class_name"]
            thr = 0.20 if ("turn" in cname or "river" in cname) else 0.40
            if conf >= thr:
                pred = self.rank_names.get(top, "")
                cleaned = normalize_rank_text(pred)
                dets[di]["ocr_text"] = (
                    cleaned if cleaned in VALID_CARD_RANKS else pred.upper()
                )
        return dets

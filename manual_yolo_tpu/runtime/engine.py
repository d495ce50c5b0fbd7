"""Fused detection engine: raw frame -> fixed-size detections in ONE program.

The reference's per-frame device round-trip is: letterbox on host (numpy) ->
tensor upload -> forward -> NMS -> download (ultralytics internals, called at
``detect.py:541``). Here the whole chain — BGR->RGB, letterbox, normalize,
backbone/neck/head, DFL decode, NMS, inverse box mapping — is a single jitted
XLA program per (frame-shape, imgsz) signature: one host->device transfer of
the uint8 frame, one device->host transfer of the padded detection set.

Batched variant runs B frames per call (SAHI-style tiles or a frame queue)
through the same program via vmap — the TPU-first answer to the reference's
serial slice loop (``pipe.py:183-194``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.ops import nms as nms_ops
from manual_yolo_tpu.ops.letterbox import letterbox, unletterbox_boxes


class DetectorEngine:
    """jit-compiled YOLOv8 detector with ultralytics-equivalent postprocess."""

    def __init__(
        self,
        params,
        spec: yolov8.ModelSpec,
        names: Optional[Dict[int, str]] = None,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        pre_nms: int = 512,
        compute_dtype=jnp.bfloat16,
    ):
        assert spec.variant == "detect"
        self.params = params
        self.spec = spec
        self.names = names or {}
        self.imgsz = int(imgsz)
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.pre_nms = pre_nms
        self.compute_dtype = compute_dtype
        self._compiled = {}

    # -- single frame ------------------------------------------------------

    def _build(self, src_hw: Tuple[int, int], batched: bool):
        H = W = self.imgsz

        def run_one(params, frame):
            rgb = frame[..., ::-1]  # reference feeds BGR; network expects RGB
            canvas, ratio, pad = letterbox(rgb, (H, W), scaleup=True)
            raw = yolov8.forward_detect_raw(
                params, self.spec, canvas[None], self.compute_dtype
            )
            boxes, scores = yolov8.decode_boxes(raw, (H, W), self.spec.strides)
            det = nms_ops.nms(
                boxes[0],
                scores[0],
                conf_thres=self.conf,
                iou_thres=self.iou,
                pre_nms=self.pre_nms,
                max_det=self.max_det,
            )
            out_boxes = unletterbox_boxes(det.boxes, ratio, pad, src_hw)
            out_boxes = jnp.where(det.scores[:, None] > 0, out_boxes, 0.0)
            return nms_ops.Detections(out_boxes, det.scores, det.classes, det.count)

        if batched:
            fn = jax.jit(jax.vmap(run_one, in_axes=(None, 0)))
        else:
            fn = jax.jit(run_one)
        return fn

    def _get(self, src_hw: Tuple[int, int], batched: bool):
        key = (src_hw, batched)
        if key not in self._compiled:
            self._compiled[key] = self._build(src_hw, batched)
        return self._compiled[key]

    def detect(self, frame_bgr: np.ndarray) -> nms_ops.Detections:
        """frame (H, W, 3) uint8 BGR -> Detections (device arrays)."""
        fn = self._get(frame_bgr.shape[:2], batched=False)
        return fn(self.params, jnp.asarray(frame_bgr))

    def detect_batch(self, frames_bgr) -> nms_ops.Detections:
        """frames (B, H, W, 3) uint8 BGR -> batched Detections."""
        frames_bgr = jnp.asarray(frames_bgr)
        fn = self._get(tuple(frames_bgr.shape[1:3]), batched=True)
        return fn(self.params, frames_bgr)

    # -- host-friendly results --------------------------------------------

    def detect_to_list(self, frame_bgr: np.ndarray):
        """Reference-parity output: list of dicts like the reference's
        parsed ultralytics results (``pipe.py:100-135``)."""
        det = jax.device_get(self.detect(frame_bgr))
        n = int(det.count)
        out = []
        h, w = frame_bgr.shape[:2]
        for i in range(n):
            x1, y1, x2, y2 = det.boxes[i].tolist()
            cid = int(det.classes[i])
            out.append(
                {
                    "x1": max(0, int(x1)),
                    "y1": max(0, int(y1)),
                    "x2": min(w - 1, int(x2)),
                    "y2": min(h - 1, int(y2)),
                    "conf": float(det.scores[i]),
                    "class_id": cid,
                    "class_name": self.names.get(cid, f"class{cid}"),
                }
            )
        return out

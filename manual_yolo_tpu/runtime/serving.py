"""Pipelined streaming engine — the throughput-serving path.

The fused single-program pipeline (runtime/pipeline.py) minimises latency
but uploads the FULL capture frame (1920x1200x3 ≈ 6.9 MB) every step; on a
tunnelled/host-attached chip the host->device link (~500 MB/s) then caps
throughput near 75 fps regardless of compute. This engine restructures the
same work to move ~5x fewer bytes and overlap everything:

  stage H1 (host):   letterbox 1920x1200 -> 640 canvas (uint8, 1.2 MB)
  stage D1 (device): canvas -> detect -> NMS -> boxes      [async dispatch]
  stage H2 (host):   gather rank crops from the FULL-RES frame (native
                     crop_u8), shortest-side resize to 64x64 (~0.2 MB)
  stage D2 (device): batched rank classification            [async dispatch]

Two frames are kept in flight: while frame N sits in D1/D2 the host
prepares frame N+1 — JAX's async dispatch gives the overlap for free, the
engine only blocks when a result is actually consumed. Steady-state
throughput ≈ max(stage time) instead of the sum.

Accuracy is identical to the fused path: detection runs on the same
letterboxed canvas; classifier crops come from the full-resolution frame
with the same pad/shortest-side semantics (reference safe_crop pad=6,
detect.py:100-113).
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

from manual_yolo_tpu.game import taxonomy


@dataclass
class _InFlight:
    frame: np.ndarray
    ratio: float
    pad: Tuple[int, int]
    det_future: object  # device arrays (async)


class StreamingEngine:
    """Throughput-oriented frame pipeline with two frames in flight."""

    def __init__(
        self,
        det_params,
        det_spec,
        cls_params,
        cls_spec,
        names: Dict[int, str],
        rank_names: Dict[int, str],
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        max_rank: int = 16,
        crop_pad: int = 6,
        compute_dtype=None,
        use_pallas_nms: Optional[bool] = None,
        depth: int = 2,
    ):
        import jax
        import jax.numpy as jnp

        from manual_yolo_tpu.models import yolov8
        from manual_yolo_tpu.ops import nms as nms_ops
        from manual_yolo_tpu.ops.pallas_nms import pallas_available

        cdt = compute_dtype or jnp.bfloat16
        if use_pallas_nms is None:
            use_pallas_nms = pallas_available()
        self.names = names
        self.rank_names = rank_names
        self.imgsz = imgsz
        self.max_rank = max_rank
        self.crop_pad = crop_pad
        self.depth = depth
        self._rank_ids = {
            i for i, n in names.items() if n in taxonomy.RANK_CLASSES
        }
        self.det_params = det_params
        self.cls_params = cls_params

        def detect(params, canvas_u8):
            x = canvas_u8.astype(jnp.float32)[None] / 255.0
            raw = yolov8.forward_detect_raw(params, det_spec, x, cdt)
            boxes, scores = yolov8.decode_boxes(raw, (imgsz, imgsz), det_spec.strides)
            return nms_ops.nms(
                boxes[0], scores[0], conf_thres=conf, iou_thres=iou,
                pre_nms=512, max_det=max_det, use_pallas=use_pallas_nms,
            )

        def classify(params, crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            logits = yolov8.forward_classify(params, cls_spec, x, cdt)
            return jax.nn.softmax(logits, axis=-1)

        self._detect = jax.jit(detect)
        self._classify = jax.jit(classify)
        self._queue: Deque[_InFlight] = collections.deque()

    # -- host stages -------------------------------------------------------

    def _letterbox_host(self, frame: np.ndarray):
        import cv2

        from manual_yolo_tpu.ops.letterbox import letterbox_params

        h, w = frame.shape[:2]
        r, nh, nw, top, left = letterbox_params((h, w), (self.imgsz, self.imgsz))
        resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
        canvas[top : top + nh, left : left + nw] = resized
        return canvas[..., ::-1].copy(), r, (top, left)  # BGR->RGB

    def _gather_rank_crops(self, frame: np.ndarray, dets) -> Tuple[np.ndarray, List[int]]:
        """Crop+resize rank-class detections from the full-res frame."""
        import cv2

        crops = np.zeros((self.max_rank, 64, 64, 3), np.uint8)
        det_idx: List[int] = []
        order = np.argsort(-dets["scores"])
        for i in order:
            if len(det_idx) >= self.max_rank:
                break
            if int(dets["classes"][i]) not in self._rank_ids:
                continue
            x1, y1, x2, y2 = dets["boxes"][i]
            p = self.crop_pad
            crop = frame[
                max(0, int(y1) - p) : int(y2) + p, max(0, int(x1) - p) : int(x2) + p
            ]
            if crop.size == 0:
                continue
            h, w = crop.shape[:2]
            s = 64 / min(h, w)
            nh, nw = max(64, round(h * s)), max(64, round(w * s))
            resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
            top, left = (nh - 64) // 2, (nw - 64) // 2
            crops[len(det_idx)] = resized[top : top + 64, left : left + 64, ::-1]
            det_idx.append(int(i))
        return crops, det_idx

    # -- pipeline ----------------------------------------------------------

    def submit(self, frame_bgr: np.ndarray) -> None:
        """Stage a frame: host letterbox + async device detect dispatch."""
        import jax.numpy as jnp

        canvas, r, pad = self._letterbox_host(frame_bgr)
        fut = self._detect(self.det_params, jnp.asarray(canvas))
        self._queue.append(_InFlight(frame_bgr, r, pad, fut))

    def _finish(self, item: _InFlight) -> List[Dict]:
        import jax
        import jax.numpy as jnp

        det = jax.device_get(item.det_future)  # blocks on D1 for this frame
        n = int(det.count)
        top, left = item.pad
        h, w = item.frame.shape[:2]
        boxes = (det.boxes[:n] - np.array([left, top, left, top])) / item.ratio
        boxes = np.clip(boxes, 0, [w, h, w, h])
        dets = {
            "boxes": boxes,
            "scores": np.asarray(det.scores[:n]),
            "classes": np.asarray(det.classes[:n]),
        }
        out = [
            {
                "class_id": int(dets["classes"][i]),
                "class_name": self.names.get(int(dets["classes"][i]), "?"),
                "bbox": [int(v) for v in dets["boxes"][i]],
                "conf": round(float(dets["scores"][i]), 3),
                "ocr_text": "",
            }
            for i in range(n)
        ]
        crops, det_idx = self._gather_rank_crops(item.frame, dets)
        if det_idx:
            probs = np.asarray(
                self._classify(self.cls_params, jnp.asarray(crops))
            )[: len(det_idx)]
            from manual_yolo_tpu.game.text import VALID_CARD_RANKS, normalize_rank_text

            for slot, di in enumerate(det_idx):
                t = int(np.argmax(probs[slot]))
                conf_t = float(probs[slot][t])
                cname = out[di]["class_name"]
                thr = 0.20 if ("turn" in cname or "river" in cname) else 0.40
                if conf_t >= thr:
                    pred = self.rank_names.get(t, "")
                    cleaned = normalize_rank_text(pred)
                    out[di]["ocr_text"] = (
                        cleaned if cleaned in VALID_CARD_RANKS else pred.upper()
                    )
        return out

    def poll(self) -> Optional[List[Dict]]:
        """Complete the oldest in-flight frame once the pipeline is full."""
        if len(self._queue) >= self.depth:
            return self._finish(self._queue.popleft())
        return None

    def drain(self) -> List[List[Dict]]:
        out = []
        while self._queue:
            out.append(self._finish(self._queue.popleft()))
        return out

    def process(self, frame_bgr: np.ndarray) -> Optional[List[Dict]]:
        """submit + poll in one call (steady-state streaming API)."""
        self.submit(frame_bgr)
        return self.poll()


def load_streaming_engine(
    detector_weights: str, classifier_weights: str, **kwargs
) -> StreamingEngine:
    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.models.classifier import RankClassifier

    det_params, det_meta = load_params(detector_weights)
    sp = det_meta.get("spec", {})
    det_spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    det_params = yolov8.fold_params(det_params, det_spec)
    names = {int(k): v for k, v in det_meta.get("names", {}).items()} or taxonomy.CLASSES
    if classifier_weights.endswith(".pt"):
        clf = RankClassifier.from_torch_checkpoint(classifier_weights)
    else:
        clf = RankClassifier.from_npz(classifier_weights)
    return StreamingEngine(
        det_params=det_params, det_spec=det_spec,
        cls_params=clf.params, cls_spec=clf.spec,
        names=names, rank_names=clf.names, **kwargs,
    )

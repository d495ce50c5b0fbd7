"""Sharded batch inference: frames parallel over the device mesh.

The reference's only "parallelism" is within-frame batching opportunities it
never exploits (SURVEY.md §2c). Here a stream of frames (or SAHI-style
tiles) is sharded over the ``data`` mesh axis and each device runs the full
fused per-frame program; no collectives are needed on the forward path, so
throughput scales linearly over ICI-connected chips.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from manual_yolo_tpu.models import yolov8
from manual_yolo_tpu.ops import nms as nms_ops
from manual_yolo_tpu.ops.letterbox import letterbox, unletterbox_boxes


class ShardedDetector:
    """Data-parallel detector over a mesh: (B, H, W, 3) -> batched Detections."""

    def __init__(
        self,
        params,
        spec: yolov8.ModelSpec,
        mesh: Mesh,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        compute_dtype=jnp.bfloat16,
        data_axis: str = "data",
    ):
        self.spec = spec
        self.mesh = mesh
        self.imgsz = imgsz
        self.data_axis = data_axis
        self.params = jax.device_put(params, NamedSharding(mesh, P()))

        H = W = imgsz

        def run(params, frames):
            # frames: (B, H0, W0, 3) uint8 BGR; boxes come back in SOURCE
            # pixel coordinates (same contract as runtime.engine)
            src_hw = frames.shape[1:3]

            def one(frame):
                rgb = frame[..., ::-1]
                canvas, ratio, pad = letterbox(rgb, (H, W), scaleup=True)
                return canvas, ratio, pad

            canvases, ratios, pads = jax.vmap(one)(frames)
            raw = yolov8.forward_detect_raw(params, spec, canvases, compute_dtype)
            boxes, scores = yolov8.decode_boxes(raw, (H, W), spec.strides)

            def post(b, s, ratio, pad):
                det = nms_ops.nms(
                    b, s, conf_thres=conf, iou_thres=iou, max_det=max_det
                )
                out = unletterbox_boxes(det.boxes, ratio, pad, src_hw)
                out = jnp.where(det.scores[:, None] > 0, out, 0.0)
                return nms_ops.Detections(out, det.scores, det.classes, det.count)

            return jax.vmap(post)(boxes, scores, ratios, pads)

        self._run = jax.jit(
            run,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(data_axis))),
            out_shardings=NamedSharding(mesh, P(data_axis)),
        )

    def __call__(self, frames_bgr) -> nms_ops.Detections:
        n_dev = self.mesh.devices.size
        b = frames_bgr.shape[0]
        pad = (-b) % n_dev
        if pad:
            frames_bgr = np.concatenate(
                [frames_bgr, np.zeros((pad,) + frames_bgr.shape[1:], frames_bgr.dtype)]
            )
        out = self._run(self.params, jnp.asarray(frames_bgr))
        if pad:
            out = nms_ops.Detections(
                out.boxes[:b], out.scores[:b], out.classes[:b], out.count[:b]
            )
        return out


def tiled_frames(frame: np.ndarray, tile: int = 640, overlap: float = 0.2):
    """Slice a large frame into overlapping tiles + offsets (SAHI-equivalent,
    reference pipe.py:183-194 — but emitted as ONE batch for the mesh)."""
    H, W = frame.shape[:2]
    stride = max(1, int(tile * (1 - overlap)))
    ys = list(range(0, max(H - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(W - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < H:
        ys.append(H - tile)
    if xs[-1] + tile < W:
        xs.append(W - tile)
    tiles, offsets = [], []
    for y in ys:
        for x in xs:
            t = frame[y : y + tile, x : x + tile]
            if t.shape[0] < tile or t.shape[1] < tile:
                pad = np.full((tile, tile, 3), 114, frame.dtype)
                pad[: t.shape[0], : t.shape[1]] = t
                t = pad
            tiles.append(t)
            offsets.append((x, y))
    return np.stack(tiles), offsets


def merge_tile_detections(
    det: nms_ops.Detections, offsets, conf_thres: float = 0.25,
    iou_thres: float = 0.7, max_det: int = 300,
) -> Dict[str, np.ndarray]:
    """Merge per-tile detections back into frame space with a global NMS."""
    det = jax.device_get(det)
    boxes, scores, classes = [], [], []
    for ti, (ox, oy) in enumerate(offsets):
        n = int(det.count[ti])
        if not n:
            continue
        b = np.asarray(det.boxes[ti][:n]) + np.array([ox, oy, ox, oy], np.float32)
        boxes.append(b)
        scores.append(np.asarray(det.scores[ti][:n]))
        classes.append(np.asarray(det.classes[ti][:n]))
    if not boxes:
        return {"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "classes": np.zeros(0, int)}
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    classes = np.concatenate(classes)
    # one-hot score matrix so the shared NMS kernel applies class-aware merge
    order = np.argsort(-scores)
    keep = []
    for i in order[: max_det * 4]:
        ok = True
        for j in keep:
            if classes[i] != classes[j]:
                continue
            bi, bj = boxes[i], boxes[j]
            x1, y1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            x2, y2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (bi[2] - bi[0]) * (bi[3] - bi[1])
            b2 = (bj[2] - bj[0]) * (bj[3] - bj[1])
            if inter / (a + b2 - inter + 1e-9) > iou_thres:
                ok = False
                break
        if ok and scores[i] > conf_thres:
            keep.append(i)
        if len(keep) >= max_det:
            break
    keep = np.asarray(keep, int)
    return {"boxes": boxes[keep], "scores": scores[keep], "classes": classes[keep]}

"""Host-side dataset loading + augmentation for the two in-repo datasets.

Mirrors the data semantics the reference gets from ultralytics' loaders:
  * classification folder dataset (``rank_classifier/{train,valid}/<class>/``,
    reference ``class.py:22-31``): random-resized-crop, horizontal flip
    (fliplr 0.5), random erasing (0.4) per the recorded hyperparameters
    (``runs/rank_classifier/args.yaml:85-102``);
  * YOLO-format detection dataset (``roadmap1.v3i.yolov8/``, data.yaml with
    64 classes): mosaic, HSV jitter, random affine (scale 0.5, translate 0.1),
    fliplr, with mosaic disabled for the last ``close_mosaic`` epochs.

Decoding and geometric augmentation run on host (numpy/cv2) — this is the IO
pipeline, not device compute; batches are handed to the device as fixed-shape
arrays so the jitted train step never retraces.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Classification folder dataset
# ---------------------------------------------------------------------------


def load_classify_folder(
    root: str, size: int = 64
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Load ``root/<class>/*`` -> (images (N,size,size,3) [0,1] RGB, labels, names)."""
    import cv2

    names = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    imgs, labels = [], []
    for ci, cname in enumerate(names):
        d = os.path.join(root, cname)
        for f in sorted(os.listdir(d)):
            img = cv2.imread(os.path.join(d, f))
            if img is None:
                continue
            h, w = img.shape[:2]
            s = size / min(h, w)
            nh, nw = max(size, round(h * s)), max(size, round(w * s))
            img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            top, left = (nh - size) // 2, (nw - size) // 2
            img = img[top : top + size, left : left + size]
            imgs.append(img[..., ::-1].astype(np.float32) / 255.0)  # BGR->RGB
            labels.append(ci)
    return np.stack(imgs), np.asarray(labels, np.int32), names


def augment_classify_batch(rng: np.random.Generator, batch: np.ndarray) -> np.ndarray:
    """Random resized crop + flip + erasing + brightness/contrast jitter."""
    n, size = batch.shape[0], batch.shape[1]
    out = np.empty_like(batch)
    import cv2

    for i in range(n):
        img = batch[i]
        # random resized crop: area scale [0.3, 1.0], aspect [3/4, 4/3]
        for _ in range(4):
            area = rng.uniform(0.3, 1.0) * size * size
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(area * ar)))
            ch = int(round(np.sqrt(area / ar)))
            if cw <= size and ch <= size:
                x0 = rng.integers(0, size - cw + 1)
                y0 = rng.integers(0, size - ch + 1)
                img = cv2.resize(
                    img[y0 : y0 + ch, x0 : x0 + cw], (size, size),
                    interpolation=cv2.INTER_LINEAR,
                )
                break
        if rng.random() < 0.5:
            img = img[:, ::-1]
        # light photometric jitter
        img = np.clip(img * rng.uniform(0.8, 1.2) + rng.uniform(-0.08, 0.08), 0, 1)
        # random erasing p=0.4 (args.yaml erasing: 0.4)
        if rng.random() < 0.4:
            ew = rng.integers(size // 8, size // 2)
            eh = rng.integers(size // 8, size // 2)
            x0 = rng.integers(0, size - ew + 1)
            y0 = rng.integers(0, size - eh + 1)
            img = img.copy()
            img[y0 : y0 + eh, x0 : x0 + ew] = rng.random()
        out[i] = img
    return out


# ---------------------------------------------------------------------------
# YOLO detection dataset
# ---------------------------------------------------------------------------


@dataclass
class DetectSample:
    image: np.ndarray  # HWC uint8 BGR (as decoded)
    boxes: np.ndarray  # (M, 4) xyxy pixels
    classes: np.ndarray  # (M,) int32


def load_yolo_split(
    root: str, split: str, max_side: Optional[int] = None
) -> List[DetectSample]:
    """Load a YOLO-txt split (``<root>/<split>/{images,labels}``).

    ``max_side`` pre-downscales decoded images once at load (boxes scaled
    accordingly) so per-step mosaic resizes stay cheap — a training-pipeline
    optimisation with no effect on canvas-space labels.
    """
    import cv2

    img_dir = os.path.join(root, split, "images")
    lbl_dir = os.path.join(root, split, "labels")
    out = []
    for f in sorted(os.listdir(img_dir)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img = cv2.imread(os.path.join(img_dir, f))
        if img is None:
            continue
        scale = 1.0
        if max_side and max(img.shape[:2]) > max_side:
            scale = max_side / max(img.shape[:2])
            img = cv2.resize(
                img, (round(img.shape[1] * scale), round(img.shape[0] * scale)),
                interpolation=cv2.INTER_AREA,
            )
        h, w = img.shape[:2]
        stem = os.path.splitext(f)[0]
        lbl_path = os.path.join(lbl_dir, stem + ".txt")
        boxes, classes = [], []
        if os.path.exists(lbl_path):
            with open(lbl_path) as fh:
                for line in fh:
                    parts = line.split()
                    if len(parts) < 5:
                        continue
                    c, xc, yc, bw, bh = (float(v) for v in parts[:5])
                    boxes.append(
                        [
                            (xc - bw / 2) * w,
                            (yc - bh / 2) * h,
                            (xc + bw / 2) * w,
                            (yc + bh / 2) * h,
                        ]
                    )
                    classes.append(int(c))
        out.append(
            DetectSample(
                image=img,
                boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                classes=np.asarray(classes, np.int32),
            )
        )
    return out


def load_yolo_names(root: str) -> Dict[int, str]:
    import yaml

    with open(os.path.join(root, "data.yaml")) as f:
        data = yaml.safe_load(f)
    names = data["names"]
    if isinstance(names, dict):
        return {int(k): v for k, v in names.items()}
    return dict(enumerate(names))


def _letterbox_np(img, boxes, imgsz, pad_val=114):
    import cv2

    h, w = img.shape[:2]
    r = min(imgsz / h, imgsz / w)
    nh, nw = round(h * r), round(w * r)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((imgsz, imgsz, 3), pad_val, img.dtype)
    top = (imgsz - nh) // 2
    left = (imgsz - nw) // 2
    canvas[top : top + nh, left : left + nw] = resized
    if len(boxes):
        boxes = boxes * r + np.array([left, top, left, top], np.float32)
    return canvas, boxes


def _hsv_jitter(rng, img, hgain=0.015, sgain=0.7, vgain=0.4):
    import cv2

    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    h, s, v = cv2.split(hsv)
    x = np.arange(256, dtype=np.int16)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    hsv = cv2.merge((cv2.LUT(h, lut_h), cv2.LUT(s, lut_s), cv2.LUT(v, lut_v)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def _affine(rng, img, boxes, classes, imgsz, scale=0.5, translate=0.1):
    import cv2

    s = rng.uniform(1 - scale, 1 + scale)
    tx = rng.uniform(0.5 - translate, 0.5 + translate) * imgsz - imgsz * s / 2
    ty = rng.uniform(0.5 - translate, 0.5 + translate) * imgsz - imgsz * s / 2
    M = np.array([[s, 0, tx], [0, s, ty]], np.float32)
    out = cv2.warpAffine(img, M, (imgsz, imgsz), borderValue=(114, 114, 114))
    if len(boxes):
        b = boxes * s + np.array([tx, ty, tx, ty], np.float32)
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, imgsz)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, imgsz)
        keep = ((b[:, 2] - b[:, 0]) > 2) & ((b[:, 3] - b[:, 1]) > 2)
        boxes, classes = b[keep], classes[keep]
    return out, boxes, classes


def _mosaic(rng, samples: Sequence[DetectSample], imgsz: int):
    """4-image mosaic on a 2*imgsz canvas, then scaled back to imgsz."""
    import cv2

    idxs = rng.integers(0, len(samples), 4)
    big = np.full((imgsz * 2, imgsz * 2, 3), 114, np.uint8)
    cx = int(rng.uniform(imgsz * 0.5, imgsz * 1.5))
    cy = int(rng.uniform(imgsz * 0.5, imgsz * 1.5))
    all_boxes, all_classes = [], []
    quads = [(0, 0, cx, cy), (cx, 0, 2 * imgsz, cy), (0, cy, cx, 2 * imgsz), (cx, cy, 2 * imgsz, 2 * imgsz)]
    for q, i in zip(quads, idxs):
        smp = samples[int(i)]
        x1, y1, x2, y2 = q
        qw, qh = x2 - x1, y2 - y1
        if qw < 2 or qh < 2:
            continue
        h, w = smp.image.shape[:2]
        r = max(qw / w, qh / h)
        nw, nh = max(qw, int(np.ceil(w * r))), max(qh, int(np.ceil(h * r)))
        resized = cv2.resize(smp.image, (nw, nh))
        ox = int(rng.uniform(0, max(nw - qw, 0) + 1e-9))
        oy = int(rng.uniform(0, max(nh - qh, 0) + 1e-9))
        big[y1:y2, x1:x2] = resized[oy : oy + qh, ox : ox + qw]
        if len(smp.boxes):
            b = smp.boxes * r - np.array([ox, oy, ox, oy], np.float32)
            b += np.array([x1, y1, x1, y1], np.float32)
            b[:, [0, 2]] = b[:, [0, 2]].clip(x1, x2)
            b[:, [1, 3]] = b[:, [1, 3]].clip(y1, y2)
            keep = ((b[:, 2] - b[:, 0]) > 2) & ((b[:, 3] - b[:, 1]) > 2)
            all_boxes.append(b[keep])
            all_classes.append(smp.classes[keep])
    img = cv2.resize(big, (imgsz, imgsz))
    if all_boxes:
        boxes = np.concatenate(all_boxes) * 0.5
        classes = np.concatenate(all_classes)
    else:
        boxes = np.zeros((0, 4), np.float32)
        classes = np.zeros((0,), np.int32)
    return img, boxes, classes


def make_detect_batch(
    rng: np.random.Generator,
    samples: Sequence[DetectSample],
    batch_size: int,
    imgsz: int,
    max_boxes: int = 160,
    mosaic: bool = True,
    augment: bool = True,
    fliplr: float = 0.5,
):
    """Build one fixed-shape training batch.

    Returns (images (B,imgsz,imgsz,3) f32 RGB [0,1],
             targets (B,max_boxes,5) [cls,x1,y1,x2,y2] canvas pixels,
             mask (B,max_boxes) bool).
    """
    B = batch_size
    # uint8 batches: 4x less host->device transfer; /255 happens on device
    imgs = np.empty((B, imgsz, imgsz, 3), np.uint8)
    tgts = np.zeros((B, max_boxes, 5), np.float32)
    mask = np.zeros((B, max_boxes), bool)
    for bi in range(B):
        if augment and mosaic:
            img, boxes, classes = _mosaic(rng, samples, imgsz)
        else:
            smp = samples[int(rng.integers(0, len(samples)))]
            img, boxes = _letterbox_np(smp.image, smp.boxes.copy(), imgsz)
            classes = smp.classes
        if augment:
            img, boxes, classes = _affine(rng, img, boxes, classes, imgsz)
            img = _hsv_jitter(rng, img)
            if rng.random() < fliplr:
                img = img[:, ::-1]
                if len(boxes):
                    boxes = boxes.copy()
                    boxes[:, [0, 2]] = imgsz - boxes[:, [2, 0]]
        imgs[bi] = img[..., ::-1]  # BGR->RGB
        n = min(len(boxes), max_boxes)
        if n:
            tgts[bi, :n, 0] = classes[:n]
            tgts[bi, :n, 1:] = boxes[:n]
            mask[bi, :n] = True
    return imgs, tgts, mask


def make_eval_batch(samples: Sequence[DetectSample], imgsz: int, max_boxes: int = 160):
    """Letterbox-only batch over ALL samples (for validation)."""
    B = len(samples)
    imgs = np.empty((B, imgsz, imgsz, 3), np.float32)
    tgts = np.zeros((B, max_boxes, 5), np.float32)
    mask = np.zeros((B, max_boxes), bool)
    metas = []
    for bi, smp in enumerate(samples):
        img, boxes = _letterbox_np(smp.image, smp.boxes.copy(), imgsz)
        imgs[bi] = img[..., ::-1].astype(np.float32) / 255.0
        n = min(len(boxes), max_boxes)
        if n:
            tgts[bi, :n, 0] = smp.classes[:n]
            tgts[bi, :n, 1:] = boxes[:n]
            mask[bi, :n] = True
        metas.append(smp)
    return imgs, tgts, mask, metas

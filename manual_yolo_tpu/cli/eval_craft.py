"""CRAFT text-detector evaluation on REAL table pixels.

The reference's EasyOCR ``readtext`` runs CRAFT over each crop before the
recognizer (``/root/reference/detect.py:198``). Our CRAFT replacement was
trained on synthetic scenes; this tool measures it on real data WITHOUT any
manual line labelling: the detection dataset's own field boxes
(villianN_name / villianN_stack / *_bet / total_pot / game_id —
single-line UI text by construction) are the ground-truth text lines.

Protocol: for every labeled image in the chosen splits, build "panel"
regions — the name-over-stack two-line panels the live pipeline feeds to
``read_region``, plus single-field regions with loose padding — run the
CRAFT forward + ``text_regions_from_scores`` exactly as
``OCREngine.read_region`` does, and score line recall / precision (a GT
line is found when a predicted box covers its center with IoU >= 0.3).

Usage:
  python -m manual_yolo_tpu.cli.eval_craft --weights weights/craft_real.npz
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Tuple

import numpy as np

DATASET_ROOT = "/root/reference/roadmap1.v3i.yolov8"

TEXT_SUFFIX = ("_name", "_stack", "_bet")
TEXT_NAMES = ("total_pot", "game_id", "my_stack", "my_bet", "iinput_field")


def _is_text(name: str) -> bool:
    return name.endswith(TEXT_SUFFIX) or name in TEXT_NAMES


def load_labeled_images(splits=("test",)) -> List[Tuple[str, List]]:
    """[(image_path, [(class_name, (x1, y1, x2, y2)), ...])] for text fields."""
    import yaml

    with open(os.path.join(DATASET_ROOT, "data.yaml")) as f:
        names = yaml.safe_load(f)["names"]
    out = []
    for split in splits:
        ldir = os.path.join(DATASET_ROOT, split, "labels")
        idir = os.path.join(DATASET_ROOT, split, "images")
        if not os.path.isdir(ldir):
            continue
        for fn in sorted(os.listdir(ldir)):
            stem = fn[:-4]
            img_path = os.path.join(idir, stem + ".jpg")
            if not os.path.exists(img_path):
                continue
            fields = []
            for ln in open(os.path.join(ldir, fn)):
                p = ln.split()
                if len(p) < 5:
                    continue
                cname = names[int(p[0])]
                if not _is_text(cname):
                    continue
                xc, yc, bw, bh = (float(v) for v in p[1:5])
                fields.append((cname, (xc - bw / 2, yc - bh / 2,
                                       xc + bw / 2, yc + bh / 2)))
            if fields:
                out.append((img_path, fields))
    return out


def build_regions(fields, w: int, h: int):
    """Group fields into evaluation regions: villainN name/stack/bet panels
    (multi-line, the hard case) + each remaining field as a padded
    single-line region. Returns [(region_xyxy, [gt_line_xyxy...])]."""
    px = lambda b: (int(b[0] * w), int(b[1] * h), int(b[2] * w), int(b[3] * h))
    groups: Dict[str, List] = {}
    singles = []
    for cname, b in fields:
        if cname.startswith("villian") and "_" in cname:
            groups.setdefault(cname.split("_")[0], []).append(px(b))
        else:
            singles.append(px(b))
    regions = []
    for lines in groups.values():
        x1 = min(l[0] for l in lines) - 6
        y1 = min(l[1] for l in lines) - 6
        x2 = max(l[2] for l in lines) + 6
        y2 = max(l[3] for l in lines) + 6
        regions.append(((max(0, x1), max(0, y1), min(w, x2), min(h, y2)),
                        lines))
    for l in singles:
        x1, y1, x2, y2 = l
        regions.append(((max(0, x1 - 8), max(0, y1 - 8),
                         min(w, x2 + 8), min(h, y2 + 8)), [l]))
    return regions


def craft_boxes(fwd, params, crop_bgr, text_threshold=0.7):
    """The exact read_region CRAFT pass (runtime/ocr.py:472-508)."""
    import cv2
    import jax.numpy as jnp

    from manual_yolo_tpu.models import craft as craft_mod

    h, w = crop_bgr.shape[:2]
    side = int(np.clip(max(h, w), 64, 512))
    side = (side + 31) // 32 * 32
    rgb = crop_bgr[..., ::-1].astype(np.float32) / 255.0
    canvas = np.zeros((side, side, 3), np.float32)
    s = min(side / h, side / w)
    nh, nw = max(1, round(h * s)), max(1, round(w * s))
    canvas[:nh, :nw] = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
    scores = np.asarray(fwd(params, jnp.asarray(canvas[None])))[0]
    boxes = craft_mod.text_regions_from_scores(scores, text_threshold=text_threshold)
    return [
        (int(x1 / s), int(y1 / s), int(x2 / s), int(y2 / s))
        for x1, y1, x2, y2 in boxes
    ]


def evaluate(weights: str, splits=("test",), text_threshold: float = 0.7,
             limit: int = 0) -> Dict:
    import cv2
    import jax
    import jax.numpy as jnp

    from manual_yolo_tpu.models import craft as craft_mod
    from manual_yolo_tpu.train.craft import _iou

    params = craft_mod.load_npz(weights)
    fwd = jax.jit(lambda p, x: craft_mod.forward(p, x, jnp.float32))

    images = load_labeled_images(splits)
    if limit:
        images = images[:limit]
    tp = fp = fn = 0
    panel_tp = panel_fn = 0
    n_regions = 0
    for img_path, fields in images:
        img = cv2.imread(img_path)
        if img is None:
            continue
        h, w = img.shape[:2]
        for (rx1, ry1, rx2, ry2), gt_lines in build_regions(fields, w, h):
            crop = img[ry1:ry2, rx1:rx2]
            if crop.size == 0 or crop.shape[0] < 8 or crop.shape[1] < 8:
                continue
            n_regions += 1
            pred = craft_boxes(fwd, params, crop, text_threshold)
            gts = [(x1 - rx1, y1 - ry1, x2 - rx1, y2 - ry1)
                   for x1, y1, x2, y2 in gt_lines]
            matched = set()
            for g in gts:
                hit = False
                gcx, gcy = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
                for pi, p in enumerate(pred):
                    if pi in matched:
                        continue
                    covers = p[0] <= gcx <= p[2] and p[1] <= gcy <= p[3]
                    if covers and _iou(g, p) >= 0.3:
                        matched.add(pi)
                        hit = True
                        break
                tp += int(hit)
                fn += int(not hit)
                if len(gts) > 1:
                    panel_tp += int(hit)
                    panel_fn += int(not hit)
            fp += len(pred) - len(matched)
    recall = tp / max(tp + fn, 1)
    precision = tp / max(tp + fp, 1)
    return {
        "weights": weights,
        "splits": list(splits),
        "regions": n_regions,
        "gt_lines": tp + fn,
        "recall": round(recall, 4),
        "precision": round(precision, 4),
        "f1": round(2 * precision * recall / max(precision + recall, 1e-9), 4),
        "panel_recall": round(panel_tp / max(panel_tp + panel_fn, 1), 4),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Evaluate CRAFT on real UI text")
    ap.add_argument("--weights", default="weights/craft_real.npz")
    ap.add_argument("--splits", default="test")
    ap.add_argument("--text-threshold", type=float, default=0.7)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)
    from manual_yolo_tpu.core.serialization import resolve_weight_path

    res = evaluate(
        resolve_weight_path(args.weights),
        splits=tuple(args.splits.split(",")),
        text_threshold=args.text_threshold,
        limit=args.limit,
    )
    print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

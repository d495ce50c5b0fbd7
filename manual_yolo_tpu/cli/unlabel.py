"""Rank-crop dataset bootstrap — equivalent of reference ``unlabel.py``.

Reads the YOLO dataset yaml, finds ``*_rank`` classes, converts normalised
boxes to pixels, and crops rank regions from train images into an output
folder for manual sorting into class directories (reference unlabel.py:1-67).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Extract unlabeled rank crops")
    ap.add_argument("--data", default="roadmap1.v3i.yolov8")
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", default="rank_crops_unlabeled")
    args = ap.parse_args(argv)

    import cv2
    import yaml

    with open(os.path.join(args.data, "data.yaml")) as f:
        names = yaml.safe_load(f)["names"]
    rank_ids = {i for i, n in enumerate(names) if n.endswith("_rank")}
    print("Rank class IDs:", sorted(rank_ids))
    print("Rank class names:", [names[i] for i in sorted(rank_ids)])

    img_dir = os.path.join(args.data, args.split, "images")
    lbl_dir = os.path.join(args.data, args.split, "labels")
    os.makedirs(args.out, exist_ok=True)

    saved = 0
    for label_file in sorted(os.listdir(lbl_dir)):
        if not label_file.endswith(".txt"):
            continue
        stem = label_file[:-4]
        img_path = None
        for ext in (".jpg", ".png", ".jpeg"):
            p = os.path.join(img_dir, stem + ext)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            continue
        image = cv2.imread(img_path)
        if image is None:
            continue
        h, w = image.shape[:2]
        with open(os.path.join(lbl_dir, label_file)) as f:
            lines = f.readlines()
        for idx, line in enumerate(lines):
            parts = line.split()
            if len(parts) < 5:
                continue
            cls = int(float(parts[0]))
            if cls not in rank_ids:
                continue
            xc, yc, bw, bh = (float(v) for v in parts[1:5])
            x1, y1 = int((xc - bw / 2) * w), int((yc - bh / 2) * h)
            x2, y2 = int((xc + bw / 2) * w), int((yc + bh / 2) * h)
            crop = image[max(0, y1) : y2, max(0, x1) : x2]
            if crop.size == 0:
                continue
            cv2.imwrite(
                os.path.join(args.out, f"{stem}_{names[cls]}_{idx}.jpg"), crop
            )
            saved += 1
    print(f"✅ {saved} crops saved in: {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

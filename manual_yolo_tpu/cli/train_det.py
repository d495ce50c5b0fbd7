"""Detector training CLI — produces poker_detector.npz from the dataset."""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the 64-class table detector")
    ap.add_argument("--data", default="roadmap1.v3i.yolov8",
                    help="YOLO dataset root (data.yaml + splits)")
    ap.add_argument("--out", default="weights/poker_detector.npz")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--patience", type=int, default=80)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--resume", action="store_true",
                    help="resume from last_<scale>.npz next to --out")
    args = ap.parse_args(argv)

    from manual_yolo_tpu.train.detector import DetTrainConfig, train_detector

    cfg = DetTrainConfig(
        data_root=args.data, out_path=args.out, epochs=args.epochs,
        batch=args.batch, imgsz=args.imgsz, patience=args.patience,
        lr=args.lr, scale=args.scale, eval_every=args.eval_every,
        resume=args.resume,
    )
    res = train_detector(cfg)
    print(json.dumps({k: v for k, v in res.items() if k != "history"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

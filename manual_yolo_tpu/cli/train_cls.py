"""Rank-classifier training CLI — equivalent of reference ``class.py``."""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the rank classifier")
    ap.add_argument("--data", default="rank_classifier",
                    help="folder dataset root with train/ and valid/")
    ap.add_argument("--out", default="weights/rank_classifier_scratch.npz")
    ap.add_argument("--epochs", type=int, default=50)  # class.py:24
    ap.add_argument("--batch", type=int, default=64)  # class.py:26
    ap.add_argument("--imgsz", type=int, default=64)  # class.py:25
    ap.add_argument("--patience", type=int, default=10)  # class.py:28
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--scale", default="n")
    ap.add_argument("--init-from", default=None, help="optional .pt warm start")
    args = ap.parse_args(argv)

    from manual_yolo_tpu.train.classifier import ClsTrainConfig, train_classifier

    cfg = ClsTrainConfig(
        data_root=args.data, out_path=args.out, epochs=args.epochs,
        batch=args.batch, imgsz=args.imgsz, patience=args.patience,
        lr=args.lr, scale=args.scale, init_from=args.init_from,
    )
    res = train_classifier(cfg)
    print(json.dumps({k: v for k, v in res.items() if k != "history"}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

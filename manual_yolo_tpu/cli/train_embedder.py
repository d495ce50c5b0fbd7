"""Train the DeepSORT appearance (re-id) embedder.

TPU-native counterpart of the trained embedder that deep-sort-realtime
ships (the reference constructs DeepSort with its default mobilenet
embedder, ``/root/reference/pipe.py:48-51``). See
``manual_yolo_tpu/train/embedder.py`` for the objective and data.

    python -m manual_yolo_tpu.cli.train_embedder \
        --data /root/reference/roadmap1.v3i.yolov8 \
        --out weights/reid_embedder.npz
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/root/reference/roadmap1.v3i.yolov8")
    ap.add_argument("--out", default="weights/reid_embedder.npz")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-npz", default="weights/rank_classifier_matched.npz")
    args = ap.parse_args(argv)

    from manual_yolo_tpu.train.embedder import ReidTrainConfig, train_embedder

    cfg = ReidTrainConfig(
        data_root=args.data, out_path=args.out, epochs=args.epochs,
        batch=args.batch, lr=args.lr, temperature=args.temperature,
        seed=args.seed, init_from_npz=args.init_npz,
    )
    metrics = train_embedder(cfg)
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()

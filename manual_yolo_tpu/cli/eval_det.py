"""Detector evaluation CLI: mAP on a dataset split.

The reference has no standalone eval (it leans on ultralytics' val);
this reports COCO-style mAP50 / mAP50-95 for any checkpoint + split.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Evaluate a detector checkpoint")
    ap.add_argument("--weights", default="weights/poker_detector.npz")
    ap.add_argument("--data", default="roadmap1.v3i.yolov8")
    ap.add_argument("--split", default="test", choices=["train", "valid", "test"])
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.7)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.train import data as data_lib
    from manual_yolo_tpu.train.detector import evaluate_detector

    params, meta = load_params(args.weights)
    sp = meta.get("spec", {})
    spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    params = yolov8.fold_params(params, spec)
    samples = data_lib.load_yolo_split(args.data, args.split)
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    res = evaluate_detector(
        params, spec, samples, args.imgsz, conf=args.conf, iou=args.iou,
        compute_dtype=cdt,
    )
    out = {
        "split": args.split,
        "n_images": len(samples),
        "checkpoint_meta": {k: meta.get(k) for k in ("map50", "map50_95", "epoch")},
        **{k: round(v, 4) for k, v in res.items()},
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

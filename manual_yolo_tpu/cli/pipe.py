"""Hand-session CLI — equivalent of running reference ``pipe.py``."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Hand-session poker pipeline")
    ap.add_argument("--source", default="screen")
    ap.add_argument("--output-dir", default="hand_outputs")
    ap.add_argument("--detector", default="weights/poker_detector.npz")
    ap.add_argument("--ocr-weights", default="weights/crnn_synth.npz")
    ap.add_argument("--imgsz", type=int, default=1280)  # pipe.py:41
    ap.add_argument("--conf", type=float, default=0.35)  # pipe.py:42
    ap.add_argument("--fps", type=int, default=6)  # pipe.py:36
    ap.add_argument("--hand-timeout", type=float, default=6.0)  # pipe.py:60
    ap.add_argument("--tile", type=int, default=640)
    ap.add_argument("--tile-overlap", type=float, default=0.2)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--show", action="store_true", help="debug overlay window")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.game import taxonomy
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.runtime.capture import make_source
    from manual_yolo_tpu.runtime.engine import DetectorEngine
    from manual_yolo_tpu.runtime.hands import HandSessionPipeline
    from manual_yolo_tpu.runtime.ocr import default_ocr_engine

    params, meta = load_params(args.detector)
    sp = meta.get("spec", {})
    spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    params = yolov8.fold_params(params, spec)
    names = {int(k): v for k, v in meta.get("names", {}).items()} or taxonomy.CLASSES
    engine = DetectorEngine(
        params, spec, names, imgsz=args.imgsz, conf=args.conf,
        compute_dtype=jnp.bfloat16,
    )
    pipeline = HandSessionPipeline(
        engine=engine,
        output_dir=args.output_dir,
        hand_timeout=args.hand_timeout,
        tile=args.tile,
        tile_overlap=args.tile_overlap,
        ocr=default_ocr_engine(args.ocr_weights),
    )
    source = make_source(args.source)
    pipeline.run(source, fps=args.fps, max_frames=args.max_frames, show=args.show)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

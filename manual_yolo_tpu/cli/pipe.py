"""Hand-session CLI — equivalent of running reference ``pipe.py``.

Defaults come from :class:`manual_yolo_tpu.config.AppConfig` (``pipe``
section mirrors the reference's constant block pipe.py:33-70); ``--config``
loads a JSON/YAML override file, flags override that.
"""

from __future__ import annotations

import argparse


def _load_embedder(weights: str):
    try:
        from manual_yolo_tpu.runtime.embedder import default_embedder

        return default_embedder(weights)
    except Exception:
        return None


def main(argv=None) -> int:
    pre = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    pre.add_argument("--config", default=None,
                     help="JSON/YAML AppConfig file providing defaults")
    pre_args, _ = pre.parse_known_args(argv)

    from manual_yolo_tpu.config import AppConfig
    from manual_yolo_tpu.runtime.ocr import DEFAULT_RECOGNIZER_WEIGHTS

    cfg = AppConfig.load(pre_args.config)

    ap = argparse.ArgumentParser(
        description="Hand-session poker pipeline", parents=[pre]
    )
    ap.add_argument("--source", default="screen")
    ap.add_argument("--output-dir", default=cfg.pipe.output_folder)
    ap.add_argument("--detector", default=cfg.detector.weights)
    ap.add_argument("--ocr-weights",
                    default=cfg.ocr.recognizer_weights or DEFAULT_RECOGNIZER_WEIGHTS)
    ap.add_argument("--text-detector",
                    default=cfg.ocr.detector_weights or "weights/craft_real.npz",
                    help="CRAFT weights for multi-line read_region fallback")
    ap.add_argument("--imgsz", type=int, default=cfg.pipe.yolo_imgsz)  # pipe.py:41
    ap.add_argument("--conf", type=float, default=cfg.pipe.yolo_conf)  # pipe.py:42
    ap.add_argument("--fps", type=int, default=cfg.pipe.input_fps)  # pipe.py:36
    ap.add_argument("--hand-timeout", type=float, default=cfg.pipe.hand_timeout)
    ap.add_argument("--tile", type=int, default=cfg.pipe.tile)
    ap.add_argument("--tile-overlap", type=float, default=cfg.pipe.tile_overlap)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--show", action="store_true", help="debug overlay window")
    ap.add_argument("--stats", action="store_true",
                    help="print per-stage timing stats on exit")
    ap.add_argument("--no-embedder", action="store_true",
                    help="disable the appearance embedder (motion+IoU only)")
    ap.add_argument("--embedder-weights", default=cfg.track.embedder_weights,
                    help="appearance-embedder npz (default: auto — "
                         "weights/reid_embedder.npz when present, else the "
                         "rank-classifier backbone)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.game import taxonomy
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.runtime.capture import make_source
    from manual_yolo_tpu.runtime.engine import DetectorEngine
    from manual_yolo_tpu.runtime.hands import HandSessionPipeline
    from manual_yolo_tpu.runtime.ocr import default_ocr_engine
    from manual_yolo_tpu.track.deepsort import DeepSortTracker

    params, meta = load_params(args.detector)
    sp = meta.get("spec", {})
    spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    params = yolov8.fold_params(params, spec)
    names = {int(k): v for k, v in meta.get("names", {}).items()} or taxonomy.CLASSES
    engine = DetectorEngine(
        params, spec, names, imgsz=args.imgsz, conf=args.conf,
        compute_dtype=jnp.bfloat16 if cfg.detector.compute_dtype == "bfloat16"
        else jnp.float32,
    )
    pipeline = HandSessionPipeline(
        engine=engine,
        output_dir=args.output_dir,
        hand_timeout=args.hand_timeout,
        tile=args.tile,
        tile_overlap=args.tile_overlap,
        ocr=default_ocr_engine(args.ocr_weights, args.text_detector)
        if cfg.ocr.enabled else None,
        tracker=DeepSortTracker(
            max_age=cfg.pipe.deepsort_max_age,
            n_init=cfg.pipe.deepsort_n_init,
            max_cosine_distance=cfg.pipe.deepsort_max_cosine_distance,
            nn_budget=cfg.pipe.deepsort_nn_budget,
            # deep-sort-realtime embeds by default (pipe.py:161-162)
            embedder=None if args.no_embedder
            else _load_embedder(args.embedder_weights),
        ),
    )
    source = make_source(args.source)
    pipeline.run(source, fps=args.fps, max_frames=args.max_frames, show=args.show)
    if args.stats:
        print(pipeline.timer.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

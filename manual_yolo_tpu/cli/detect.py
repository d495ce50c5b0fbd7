"""Live detection CLI — equivalent of running reference ``detect.py``.

Usage:
  python -m manual_yolo_tpu.cli.detect --source screen          # live capture
  python -m manual_yolo_tpu.cli.detect --source shots_dir/ --max-frames 50
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Live poker table detection")
    ap.add_argument("--source", default="screen",
                    help="'screen', 'synthetic', or an image/dir/video path")
    ap.add_argument("--output-dir", default="live_output")
    ap.add_argument("--detector", default="weights/poker_detector.npz")
    ap.add_argument("--classifier", default="weights/rank_classifier_scratch.npz")
    ap.add_argument("--ocr-weights", default="weights/crnn_synth.npz")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--save-screenshots", action="store_true")
    ap.add_argument("--region", default=None,
                    help="capture region 'top,left,width,height' (detect.py:18)")
    args = ap.parse_args(argv)

    from manual_yolo_tpu.runtime.capture import make_source
    from manual_yolo_tpu.runtime.live import LiveLoop
    from manual_yolo_tpu.runtime.ocr import default_ocr_engine
    from manual_yolo_tpu.runtime.shot import load_fused_pipeline

    pipeline = load_fused_pipeline(
        args.detector, args.classifier, imgsz=args.imgsz, conf=args.conf
    )
    kwargs = {}
    if args.source == "screen" and args.region:
        t, l, w, h = (int(v) for v in args.region.split(","))
        kwargs["region"] = {"top": t, "left": l, "width": w, "height": h}
    source = make_source(args.source, **kwargs)

    loop = LiveLoop(
        pipeline=pipeline,
        output_dir=args.output_dir,
        show_window=args.show,
        save_screenshots=args.save_screenshots,
        ocr=default_ocr_engine(args.ocr_weights),
    )
    print("Starting live detection." + (" Press 'q' in the window to quit." if args.show else ""))
    loop.run(source, max_frames=args.max_frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

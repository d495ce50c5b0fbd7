"""Installation smoke check — equivalent of reference ``test_yolo.py``.

Constructs every engine, checks weights, and reports per-component status
(the reference's post-install check wired into its setup scripts,
``setup_env.bat:40``). Exit code 0 only when all REQUIRED checks pass.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    from manual_yolo_tpu.runtime.ocr import DEFAULT_RECOGNIZER_WEIGHTS
    ap = argparse.ArgumentParser(description="Framework smoke check")
    ap.add_argument("--detector", default="weights/poker_detector.npz")
    ap.add_argument("--classifier", default="weights/rank_classifier_matched.npz")
    ap.add_argument("--ocr-weights", default=DEFAULT_RECOGNIZER_WEIGHTS)
    args = ap.parse_args(argv)

    failures = 0

    def check(name, fn, required=True):
        nonlocal failures
        try:
            extra = fn() or ""
            print(f"✅ {name} {extra}")
        except Exception as e:
            mark = "❌" if required else "⚠"
            print(f"{mark} {name}: {type(e).__name__}: {e}")
            if required:
                failures += 1

    def jax_backend():
        import jax

        return f"({jax.devices()[0].platform}, {len(jax.devices())} device(s))"

    check("JAX backend", jax_backend)

    def classifier():
        from manual_yolo_tpu.models.classifier import RankClassifier

        if args.classifier.endswith(".pt"):
            clf = RankClassifier.from_torch_checkpoint(args.classifier)
        else:
            clf = RankClassifier.from_npz(args.classifier)
        import numpy as np

        out = clf.classify_crops([np.zeros((32, 24, 3), np.uint8)])
        return f"({len(clf.names)} classes, probe -> {out[0][0]!r})"

    check("rank classifier", classifier)

    def detector():
        from manual_yolo_tpu.core.serialization import load_params
        from manual_yolo_tpu.models import yolov8

        params, meta = load_params(args.detector)
        sp = meta.get("spec", {})
        spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
        yolov8.fold_params(params, spec)
        return f"(nc={spec.nc}, map50={meta.get('map50', '?')})"

    check("detector weights", detector)

    def ocr():
        from manual_yolo_tpu.runtime.ocr import OCREngine

        eng = OCREngine.from_npz(args.ocr_weights)
        import numpy as np

        eng.read_batch([np.zeros((20, 60), np.float32)], "numeric")
        return f"(width={eng.width})"

    check("OCR recognizer", ocr, required=False)

    def trackers():
        from manual_yolo_tpu.track.bytetrack import ByteTrack
        from manual_yolo_tpu.track.deepsort import DeepSortTracker

        ByteTrack().update([])
        DeepSortTracker().update_tracks([])
        return ""

    check("trackers", trackers)

    def native():
        from manual_yolo_tpu.runtime.native import get_lib

        lib = get_lib()
        return "(C++ runtime)" if lib is not None else "(python fallback)"

    check("native runtime", native, required=False)

    def capture():
        from manual_yolo_tpu.runtime.capture import synthetic_source

        next(synthetic_source(hw=(64, 64)))
        return ""

    check("capture sources", capture)

    if os.environ.get("OPENAI_API_KEY"):
        print("✅ OPENAI_API_KEY present (LLM fallback enabled)")
    else:
        print("⚠ OPENAI_API_KEY not set (LLM fallback disabled)")

    print("PASS" if failures == 0 else f"FAIL ({failures} required checks failed)")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

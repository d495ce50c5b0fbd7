"""Which signal separates wrong OCR reads from correct ones?

The round-5 sweep showed the winning-candidate confidence is uncalibrated:
all errors (including the catastrophic SolemnInflux->ru collapse) win at
0.92-0.999, indistinguishable from correct reads. This probe measures
alternative escalation signals per crop on the data/ocr_real holdout:

  * margin: winner conf - best DIFFERENT validated text's conf
  * n_valid: number of distinct validated texts in the candidate pool
  * len_ratio: len(pred) / expected chars from crop aspect (collapse
    detector: a 2-char read of a 12-char-wide name crop is anomalous)

Usage: JAX_PLATFORMS=cpu python tools/gate_signal_probe.py [splits]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    from manual_yolo_tpu.cli.eval_ocr import load_real_crops
    from manual_yolo_tpu.runtime.ocr import (
        DEFAULT_RECOGNIZER_WEIGHTS, OCREngine, field_kind,
    )

    splits = tuple((sys.argv[1] if len(sys.argv) > 1 else "test,test2").split(","))
    eng = OCREngine.from_npz(DEFAULT_RECOGNIZER_WEIGHTS)
    items = list(load_real_crops("data/ocr_real/labels.json", splits=splits))
    rows = []
    # group crops by kind, read candidates in bulk
    by_kind = {}
    for idx, (crop, cname, truth) in enumerate(items):
        by_kind.setdefault(field_kind(cname), []).append(idx)
    grays = [eng._to_gray(c) for c, _, _ in items]
    for kind, idxs in by_kind.items():
        cands_all = eng.read_batch_candidates([grays[i] for i in idxs], kind)
        for i, cands in zip(idxs, cands_all):
            crop, cname, truth = items[i]
            low = cname.lower()
            truth_norm = OCREngine._validate(kind, low, truth)
            # validated candidates in confidence order
            vals = []
            for text, conf in cands:
                v = OCREngine._validate(kind, low, text)
                if v and (not vals or all(v != t for t, _ in vals)):
                    vals.append((v, conf))
            if not vals:
                rows.append({"class": cname, "truth": truth_norm,
                             "pred": None})
                continue
            pred, c1 = vals[0]
            c2 = vals[1][1] if len(vals) > 1 else -1.0
            h, w = crop.shape[:2]
            # expected glyph count from aspect: UI glyphs are ~0.55 x line
            # height wide
            exp_chars = max(1.0, (w / max(h, 1)) / 0.55)
            rows.append({
                "class": cname, "kind": kind, "truth": truth_norm,
                "pred": pred, "ok": pred == truth_norm,
                "conf": round(float(c1), 4),
                "margin": round(float(c1 - c2), 4) if c2 >= 0 else 1.0,
                "n_valid": len(vals),
                "len_ratio": round(len(pred) / exp_chars, 3),
            })
    ok = [r for r in rows if r.get("ok")]
    bad = [r for r in rows if r.get("pred") is not None and not r["ok"]]

    def stats(rs, key):
        v = sorted(r[key] for r in rs if key in r)
        if not v:
            return None
        q = lambda p: v[min(len(v) - 1, int(p * len(v)))]
        return [round(q(0.05), 3), round(q(0.5), 3), round(q(0.95), 3)]

    print(f"splits={splits} n={len(rows)} ok={len(ok)} wrong={len(bad)}")
    for key in ("conf", "margin", "n_valid", "len_ratio"):
        print(f"  {key}: ok p5/50/95={stats(ok, key)} "
              f"wrong p5/50/95={stats(bad, key)}")
    print("\nwrong rows:")
    for r in bad:
        print(" ", json.dumps(r))


if __name__ == "__main__":
    main()

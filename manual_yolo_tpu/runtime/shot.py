"""Single-screenshot pipeline — the reliable surface of reference ``yolo.py``.

Equivalent of ``PokerDetector.process_screenshot`` (``yolo.py:359-453``):
image file in -> detections -> per-class content extraction -> flat result
JSON + annotated image out. Differences by design:

  * rank fields are read by the batched rank classifier (device) rather than
    the OCR binarise-grid; numeric/name fields go through the OCR engine if
    one is configured (runtime/ocr.py) — the reference's EasyOCR cascade is
    a vendored-engine behaviour we replace (SURVEY.md §2b);
  * all model compute happens in ONE fused device program (FusedPipeline);
  * JSON writes are atomic (reference write_json_atomic, yolo.py:330).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from manual_yolo_tpu.game import schema, taxonomy
from manual_yolo_tpu.game.text import suit_char
from manual_yolo_tpu.runtime.pipeline import FusedPipeline


def _safe_crop(frame: np.ndarray, bbox: List[int]) -> np.ndarray:
    x1, y1, x2, y2 = bbox
    return frame[max(0, y1) : max(y1 + 1, y2), max(0, x1) : max(x1 + 1, x2)]


def llm_should_escalate(d: Dict) -> bool:
    """The cascade's per-field failure gate: escalate when the local read
    is empty, OR when its confidence (as recorded by
    ``OCREngine.read_fields_conf`` — collapse-demoted for catastrophic
    length-collapse reads) falls below the kind's calibrated
    ``OCREngine.LLM_GATE`` (docs/PARITY.md failure-gate table)."""
    from manual_yolo_tpu.runtime.ocr import OCREngine, field_kind

    if not d.get("ocr_text"):
        return True
    conf = d.get("ocr_conf")
    if conf is None or conf < 0:
        return False  # no confidence signal (e.g. classifier rank path)
    gate = OCREngine.LLM_GATE.get(field_kind(d["class_name"]), 0.0)
    return conf < gate


def _llm_escalate(frame: np.ndarray, dets: List[Dict]) -> int:
    """Vision-LLM fallback for important fields local reads left empty OR
    read below the calibrated per-kind confidence gate (reference
    ``yolo.py:629-747``, gated on the API key like ``yolo.py:47``; the
    confidence gate mirrors the reference's escalate-on-low-confidence at
    every tier, ``detect.py:186-189,226`` — calibration table in
    docs/PARITY.md).

    Builds a labelled collage of the failing crops, queries the LLM once,
    validates each returned value with the same per-kind rules as OCR, and
    fills the detections in place. Returns the number of fields filled.
    """
    from manual_yolo_tpu.runtime import llm_fallback
    from manual_yolo_tpu.runtime.ocr import OCREngine, field_kind

    important = set(llm_fallback.IMPORTANT_KEYS)
    missing = [
        d for d in dets
        if d["class_name"] in taxonomy.OCR_CLASSES
        and d["class_name"] in important
        and llm_should_escalate(d)
    ]
    if not missing:
        return 0
    collage = llm_fallback.build_collage(
        [(d["class_name"], _safe_crop(frame, d["bbox"])) for d in missing]
    )
    if collage is None:
        return 0
    values = llm_fallback.query_vision_llm(
        collage, [d["class_name"] for d in missing]
    )
    filled = 0
    for d in missing:
        raw = values.get(d["class_name"])
        if not raw:
            continue
        kind = field_kind(d["class_name"])
        text = OCREngine._validate(kind, d["class_name"].lower(), str(raw))
        if text:
            d["ocr_text"] = text
            filled += 1
    return filled


def process_screenshot(
    pipeline: FusedPipeline,
    image_path: str,
    output_json: str = "poker_result.json",
    output_image: Optional[str] = "poker_labeled.png",
    ocr: Optional[Callable[[np.ndarray, str], Optional[str]]] = None,
    accumulate: bool = False,
    use_llm_fallback: Optional[bool] = None,
) -> Dict:
    """Run the single-shot pipeline on an image file; returns the result dict.

    ``accumulate=True`` merges newly-read fields into the existing output
    JSON fill-don't-overwrite (the reference's ACCUMULATE_DATA mode,
    ``yolo.py:599-603``). ``use_llm_fallback=None`` auto-enables the vision
    LLM escalation when ``OPENAI_API_KEY`` is set (reference gating,
    ``yolo.py:47,643-646``); the query degrades to a no-op offline.
    """
    import cv2

    frame = cv2.imread(image_path)
    if frame is None:
        raise FileNotFoundError(f"cannot read image: {image_path}")
    dets = pipeline.process_frame(frame)

    # pass 1: OCR every text field the fused program left empty (rank classes
    # included — classifier-below-threshold falls through, detect.py:242-245)
    if ocr is not None:
        todo = [
            d for d in dets
            if not d.get("ocr_text") and d["class_name"] in taxonomy.OCR_CLASSES
        ]
        read_fields_conf = getattr(ocr, "read_fields_conf", None)
        read_fields = getattr(ocr, "read_fields", None)
        if todo and read_fields_conf is not None:
            pairs = read_fields_conf(
                [_safe_crop(frame, d["bbox"]) for d in todo],
                [d["class_name"] for d in todo],
            )
            for d, (t, c) in zip(todo, pairs):
                d["ocr_text"] = t or ""
                d["ocr_conf"] = round(float(c), 3)
        elif todo and read_fields is not None:
            texts = read_fields(
                [_safe_crop(frame, d["bbox"]) for d in todo],
                [d["class_name"] for d in todo],
            )
            for d, t in zip(todo, texts):
                d["ocr_text"] = t or ""
        else:
            for d in todo:
                d["ocr_text"] = ocr(_safe_crop(frame, d["bbox"]), d["class_name"]) or ""

    # pass 2: vision-LLM escalation for still-empty important fields
    if use_llm_fallback is None:
        use_llm_fallback = bool(os.environ.get("OPENAI_API_KEY"))
    if use_llm_fallback:
        _llm_escalate(frame, dets)

    card_ranks: Dict[str, str] = {}
    card_suits: Dict[str, str] = {}
    community: Dict[str, str] = {}
    buttons: List[Dict] = []

    for d in dets:
        name = d["class_name"]
        x1, y1, x2, y2 = d["bbox"]
        text = d.get("ocr_text") or ""

        if "_rank" in name and text:
            card_ranks[name] = text
        elif "_suite_" in name:
            # class name encodes the suit; store under the matching rank key
            card_suits[name.split("_suite_")[0] + "_rank"] = suit_char(name)
        elif text:
            # non-rank field values (stack/bet/pot/name/game_id). NOTE: the
            # reference's process_screenshot reads these but never stores
            # them (yolo.py:387-391 only keeps *_rank), leaving my_stack /
            # villains empty in its own output — we store them as the
            # schema clearly intends (yolo.py:425-445 reads these keys).
            card_ranks[name] = text

        if name.startswith(("flop", "turn", "river")) and "_rank" in name and text:
            community[name] = text + card_suits.get(name, "")

        if name.startswith("button_"):
            buttons.append(
                {"button": name, "center": [(x1 + x2) // 2, (y1 + y2) // 2]}
            )

    result = schema.build_flat_result(card_ranks, card_suits, community, buttons)
    if accumulate and os.path.exists(output_json):
        import json

        from manual_yolo_tpu.game.accumulate import merge_detected_values

        try:
            with open(output_json, encoding="utf-8") as f:
                existing = json.load(f)
        except (OSError, json.JSONDecodeError):
            existing = {}
        result, _changes = merge_detected_values(existing, result)
    schema.write_json_atomic(os.path.abspath(output_json), result)

    if output_image:
        annotated = frame.copy()
        for d in dets:
            x1, y1, x2, y2 = d["bbox"]
            label = f"{d['class_name']}:{d.get('ocr_text') or ''}"
            cv2.rectangle(annotated, (x1, y1), (x2, y2), (255, 0, 0), 2)
            cv2.putText(
                annotated, label, (x1, max(0, y1 - 5)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
            )
        cv2.imwrite(output_image, annotated)
    return result


def load_fused_pipeline(
    detector_weights: str,
    classifier_weights: str,
    imgsz: int = 640,
    conf: float = 0.25,
    iou: float = 0.7,
    compute_dtype: str = "bfloat16",
) -> FusedPipeline:
    """Construct the fused pipeline from native (.npz) or torch (.pt) weights."""
    import jax.numpy as jnp

    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.models.classifier import RankClassifier

    det_params, det_meta = load_params(detector_weights)
    sp = det_meta.get("spec", {})
    det_spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    det_params = yolov8.fold_params(det_params, det_spec)
    names = {int(k): v for k, v in det_meta.get("names", {}).items()} or taxonomy.CLASSES

    if classifier_weights.endswith(".pt"):
        clf = RankClassifier.from_torch_checkpoint(classifier_weights)
    else:
        clf = RankClassifier.from_npz(classifier_weights)

    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    return FusedPipeline(
        det_params=det_params,
        det_spec=det_spec,
        cls_params=clf.params,
        cls_spec=clf.spec,
        names=names,
        rank_names=clf.names,
        imgsz=imgsz,
        conf=conf,
        iou=iou,
        compute_dtype=cdt,
    )

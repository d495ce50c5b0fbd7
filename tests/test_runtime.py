"""Fused pipeline + live loop + hand-session runtime tests (random weights)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.game import taxonomy  # noqa: E402
from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.runtime.pipeline import FusedPipeline, crop_resize_center  # noqa: E402


@pytest.fixture(scope="module")
def tiny_pipeline():
    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    return FusedPipeline(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES,
        rank_names={i: n for i, n in enumerate(
            ["10", "2", "3", "4", "5", "6", "7", "8", "9", "A", "J", "K", "Q"]
        )},
        imgsz=192, conf=1e-6, compute_dtype=jnp.float32, max_rank=4,
    )


def test_crop_resize_center_semantics():
    """On-device crop must match the host shortest-side+center-crop result."""
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (100, 160, 3), np.uint8)
    box = jnp.asarray([30.0, 20.0, 80.0, 90.0])
    crop = np.asarray(crop_resize_center(jnp.asarray(frame), box, 64, 0.0))
    assert crop.shape == (64, 64, 3)
    # center pixel of the crop tracks the box center pixel
    cx, cy = 55, 55  # (30+80)/2, (20+90)/2
    center = crop[32, 32]
    assert np.abs(center.astype(int) - frame[cy, cx].astype(int)).max() <= 64


def test_fused_pipeline_outputs(tiny_pipeline):
    frame = np.random.default_rng(0).integers(0, 255, (200, 320, 3), np.uint8)
    res = jax.device_get(tiny_pipeline(frame))
    assert res.boxes.shape == (300, 4)
    assert res.rank_probs.shape == (4, 13)
    n = int(res.count)
    assert 0 <= n <= 300
    for slot in range(4):
        di = int(res.rank_det_idx[slot])
        if di >= 0:
            assert taxonomy.CLASSES[int(res.classes[di])] in taxonomy.RANK_CLASSES
            np.testing.assert_allclose(res.rank_probs[slot].sum(), 1.0, atol=1e-4)


def test_process_frame_threshold_routing(tiny_pipeline):
    frame = np.random.default_rng(1).integers(0, 255, (200, 320, 3), np.uint8)
    dets = tiny_pipeline.process_frame(frame)
    for d in dets:
        assert set(d) >= {"class_id", "class_name", "bbox", "conf", "ocr_text"}
        if d["class_name"] in taxonomy.RANK_CLASSES and d["ocr_text"]:
            # anything emitted must be a plausible rank string
            assert d["ocr_text"].upper() == d["ocr_text"]


def test_live_loop_persists_jsonl(tmp_path, tiny_pipeline):
    from manual_yolo_tpu.runtime.live import LiveLoop, export_detections_array
    from manual_yolo_tpu.runtime.capture import synthetic_source

    loop = LiveLoop(pipeline=tiny_pipeline, output_dir=str(tmp_path))
    src = synthetic_source(hw=(200, 320), seed=0)
    loop.run(src, max_frames=3)
    jsonl = tmp_path / "detections.jsonl"
    rows = [json.loads(l) for l in open(jsonl)]
    assert [r["frame"] for r in rows] == [0, 1, 2]
    # compat exporter produces the reference's array format
    arr_path = export_detections_array(str(tmp_path))
    arr = json.loads(open(arr_path).read())
    assert len(arr) == 3 and arr[0]["detections"] is not None
    # game file saved
    assert (tmp_path / "game_1.json").exists()


class _CannedPipeline:
    """process_frame stub returning fixed detections (no device work)."""

    def __init__(self, dets):
        self._dets = dets

    def process_frame(self, frame):
        return [dict(d) for d in self._dets]


class _SpyOCR:
    """read_fields-style engine recording its (batched) invocations."""

    def __init__(self, answers):
        self.answers = answers
        self.batch_calls = []

    def read_fields(self, crops, names, min_confidence=0.35):
        self.batch_calls.append(list(names))
        return [self.answers.get(n) for n in names]


def test_live_loop_rank_classifier_ocr_fallback(tmp_path):
    """A rank detection the classifier left empty must fall through to OCR
    (reference detect.py:242-245), batched with the other fields in ONE
    read_fields call."""
    from manual_yolo_tpu.runtime.live import LiveLoop

    dets = [
        # classifier below threshold -> empty ocr_text, must reach OCR
        {"class_id": 6, "class_name": "card1_rank", "bbox": [10, 10, 40, 50],
         "conf": 0.9, "ocr_text": ""},
        # classifier confident -> already resolved, must NOT reach OCR
        {"class_id": 11, "class_name": "card2_rank", "bbox": [50, 10, 80, 50],
         "conf": 0.9, "ocr_text": "K"},
        {"class_id": 34, "class_name": "my_stack", "bbox": [10, 60, 80, 80],
         "conf": 0.8, "ocr_text": ""},
    ]
    ocr = _SpyOCR({"card1_rank": "6", "my_stack": "1.2k"})
    loop = LiveLoop(
        pipeline=_CannedPipeline(dets), output_dir=str(tmp_path), ocr=ocr
    )
    frame = np.zeros((100, 100, 3), np.uint8)
    info = loop.step(frame)
    loop.close()
    assert ocr.batch_calls == [["card1_rank", "my_stack"]]
    by_name = {d["class_name"]: d["ocr_text"] for d in info["detections"]}
    assert by_name["card1_rank"] == "6"  # fallback filled it
    assert by_name["card2_rank"] == "K"  # classifier read untouched
    assert by_name["my_stack"] == "1.2k"


def test_shot_llm_escalation(tmp_path, monkeypatch):
    """Important fields still empty after OCR escalate to the vision LLM
    (reference yolo.py:629-747) and land validated in the result JSON."""
    import cv2

    from manual_yolo_tpu.runtime import llm_fallback, shot

    img = tmp_path / "t.png"
    cv2.imwrite(str(img), np.zeros((100, 100, 3), np.uint8))
    dets = [
        {"class_id": 6, "class_name": "card1_rank", "bbox": [10, 10, 40, 50],
         "conf": 0.9, "ocr_text": ""},
        {"class_id": 34, "class_name": "my_stack", "bbox": [10, 60, 80, 80],
         "conf": 0.8, "ocr_text": ""},
        {"class_id": 60, "class_name": "villian1_name", "bbox": [5, 5, 60, 20],
         "conf": 0.8, "ocr_text": ""},
    ]
    asked = {}

    def fake_query(collage, missing_keys, **kw):
        asked["keys"] = list(missing_keys)
        # raw LLM output: needs validation (lowercase rank, junk chars)
        return {"card1_rank": "a", "my_stack": "1.2k", "villian1_name": "bob_99"}

    monkeypatch.setattr(llm_fallback, "query_vision_llm", fake_query)
    out_json = tmp_path / "r.json"
    res = shot.process_screenshot(
        _CannedPipeline(dets), str(img), output_json=str(out_json),
        output_image=None, use_llm_fallback=True,
    )
    assert sorted(asked["keys"]) == ["card1_rank", "my_stack", "villian1_name"]
    assert res["card1"] == "A"  # validated/normalised rank
    assert res["my_stack"] == "1.2K"  # numeric validator normalises suffix case
    assert res["villains"][0]["name"] == "bob_99"
    # disabled mode must not query
    asked.clear()
    shot.process_screenshot(
        _CannedPipeline(dets), str(img), output_json=str(out_json),
        output_image=None, use_llm_fallback=False,
    )
    assert not asked


def test_hand_session_timeout_finalizes(tmp_path):
    """Button seen, then inactivity > timeout -> hand JSON written."""
    from manual_yolo_tpu.runtime.hands import HandSessionPipeline

    class FakeEngine:
        names = dict(taxonomy.CLASSES)
        conf = 0.35
        iou = 0.7

        def __init__(self):
            self.frames = 0

        def detect_to_list(self, frame):
            self.frames += 1
            if self.frames == 1:
                return [
                    {"x1": 10, "y1": 10, "x2": 60, "y2": 40, "conf": 0.9,
                     "class_id": taxonomy.CLASS_IDS["button_fold"],
                     "class_name": "button_fold"}
                ] * 6  # enough to skip tiling
            return [{"x1": 0, "y1": 0, "x2": 5, "y2": 5, "conf": 0.4,
                     "class_id": 63, "class_name": "winner"}] * 6

    pipe = HandSessionPipeline(
        engine=FakeEngine(), output_dir=str(tmp_path), hand_timeout=0.0
    )
    frame = np.zeros((100, 100, 3), np.uint8)
    pipe.step(frame)  # button seen -> hand starts
    import time

    time.sleep(0.01)
    pipe.step(frame)  # no buttons + timeout 0 -> finalize
    hands = [f for f in os.listdir(tmp_path) if f.startswith("hand_")]
    assert len(hands) == 1
    rec = json.loads(open(os.path.join(tmp_path, hands[0])).read())
    assert rec["hand_index"] == 1
    assert rec["buttons"] == [] or rec["buttons"][0]["class"].startswith("button_")

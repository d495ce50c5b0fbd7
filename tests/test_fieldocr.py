"""Changed-field OCR memo (runtime/fieldocr.py) + bench stream realism."""

import numpy as np
import pytest

pytest.importorskip("jax")

from manual_yolo_tpu.runtime.fieldocr import (  # noqa: E402
    FieldOCRMemo,
    is_text_field,
    same_content,
)


class FakeEngine:
    """Counts reads; returns the crop mean as 'text' so cache correctness
    is observable."""

    def __init__(self):
        self.calls = []

    def read_fields(self, crops, names, min_confidence=0.35):
        self.calls.append(len(crops))
        return [f"t{int(c.mean())}" for c in crops]


def _det(cid, name, bbox):
    return {"class_id": cid, "class_name": name, "bbox": list(bbox),
            "conf": 0.9, "ocr_text": ""}


def test_is_text_field_matches_reference_cascade():
    # OCR-eligible (detect.py:580-600 routes these through EasyOCR)
    for n in ("villian3_stack", "villian1_name", "total_pot", "game_id",
              "my_bet", "iinput_field"):
        assert is_text_field(n), n
    # classifier-owned / non-text classes
    for n in ("card1_rank", "flop2_suite_heart", "button_fold",
              "position_BB"):
        assert not is_text_field(n), n


def test_same_content_tolerates_global_shift_not_repaints():
    rng = np.random.default_rng(0)
    a = rng.integers(30, 220, (20, 60, 3), np.uint8)
    shifted = np.clip(a.astype(np.int16) + [4, -6, 2], 0, 255).astype(np.uint8)
    assert same_content(a.astype(np.int16), shifted)
    repaint = a.copy()
    repaint[5:15, 10:50] = 255  # text redraw
    assert not same_content(a.astype(np.int16), repaint)
    assert not same_content(a.astype(np.int16), a[:10])  # geometry change


def test_memo_reads_once_then_serves_from_cache():
    rng = np.random.default_rng(1)
    frame = rng.integers(20, 230, (100, 200, 3), np.uint8)
    eng = FakeEngine()
    memo = FieldOCRMemo(eng)
    dets = [_det(50, "villian1_stack", (10, 10, 60, 30)),
            _det(42, "total_pot", (80, 40, 160, 60)),
            _det(6, "card1_rank", (100, 70, 120, 90))]  # rank: not OCR'd
    memo.process([frame], [dets])
    assert eng.calls == [2]
    assert dets[0]["ocr_text"].startswith("t")
    assert dets[2]["ocr_text"] == ""

    # jittered frame: same content -> zero new reads
    jit = np.clip(frame.astype(np.int16) + [3, -2, 5], 0, 255).astype(np.uint8)
    dets2 = [_det(50, "villian1_stack", (10, 10, 60, 30)),
             _det(42, "total_pot", (80, 40, 160, 60))]
    memo.process([jit], [dets2])
    assert eng.calls == [2]
    assert dets2[0]["ocr_text"] == dets[0]["ocr_text"]

    # repaint one field -> exactly one new read
    rep = jit.copy()
    rep[40:60, 80:160] = 250
    dets3 = [_det(50, "villian1_stack", (10, 10, 60, 30)),
             _det(42, "total_pot", (80, 40, 160, 60))]
    memo.process([rep], [dets3])
    assert eng.calls == [2, 1]
    s = memo.stats()
    assert s["fields_read"] == 3 and s["fields_memo"] == 3


def test_memo_is_per_slot():
    rng = np.random.default_rng(2)
    f0 = rng.integers(20, 230, (50, 80, 3), np.uint8)
    f1 = f0.copy()
    f1[10:20, 10:70] = 255  # slot 1 shows different content
    eng = FakeEngine()
    memo = FieldOCRMemo(eng)
    d0 = [_det(42, "total_pot", (5, 5, 75, 25))]
    d1 = [_det(42, "total_pot", (5, 5, 75, 25))]
    memo.process([f0, f1], [d0, d1])
    assert eng.calls == [2]  # same class, different slots: both read
    assert d0[0]["ocr_text"] != d1[0]["ocr_text"]


def test_memo_dedups_identical_content_across_slots():
    """Identical field pixels (multi-lane streams of one source, shared
    skin elements) must cost ONE recognizer read: in-batch duplicates fan
    out the same text, and later slots hit the content memo with no read."""
    rng = np.random.default_rng(4)
    frame = rng.integers(20, 230, (50, 80, 3), np.uint8)
    eng = FakeEngine()
    memo = FieldOCRMemo(eng)
    d0 = [_det(42, "total_pot", (5, 5, 75, 25))]
    d1 = [_det(42, "total_pot", (5, 5, 75, 25))]
    memo.process([frame, frame.copy()], [d0, d1])
    assert eng.calls == [1]  # same pixels: one read, fanned out
    assert d0[0]["ocr_text"] == d1[0]["ocr_text"] != ""
    # a THIRD slot appearing later with the same content: content-memo hit
    d2 = [_det(42, "total_pot", (5, 5, 75, 25))]
    memo.process([None, None, frame.copy()], [[], [], d2])
    assert eng.calls == [1]
    assert d2[0]["ocr_text"] == d0[0]["ocr_text"]
    s = memo.stats()
    assert s["fields_dedup"] == 2 and s["fields_read"] == 1


def test_memo_overload_guard_defers():
    rng = np.random.default_rng(3)
    frame = rng.integers(20, 230, (40, 300, 3), np.uint8)
    eng = FakeEngine()
    memo = FieldOCRMemo(eng, max_read_per_batch=2)
    dets = [_det(48 + i, f"villian{i+1}_bet", (i * 50, 5, i * 50 + 40, 30))
            for i in range(5)]
    memo.process([frame], [dets])
    assert eng.calls == [2]
    assert memo.stats()["fields_deferred"] == 3
    # deferred fields are read on the next batch
    memo.process([frame], [dets])
    assert eng.calls == [2, 2]


def test_bench_stream_has_localized_repaints():
    """make_frames must produce localized content deltas (raw segments for
    the encoder), not just global jitter."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    frames = bench.make_frames(n=8, seed=0)
    assert len(frames) == 8
    assert frames[0].shape == (1200, 1920, 3)
    stats = bench.make_frames.stats
    assert sum(stats[k] for k in ("numeric", "name", "card", "badge")) >= 5
    # consecutive frames: the delta must contain pixels a global shift
    # cannot explain (i.e. localized content), in a small fraction of area
    d = frames[1].astype(np.int16) - frames[0].astype(np.int16)
    med = np.median(d.reshape(-1, 3), axis=0)
    resid = np.abs(d - med).max(axis=-1)
    changed = resid > 20
    assert changed.any(), "no localized content delta"
    assert changed.mean() < 0.25, "deltas not localized"


def test_async_reads_catch_up_next_batch():
    """async_reads mode: the first sighting of a field dispatches its read
    without blocking (text stays empty that batch); once the reader thread
    lands, the SAME pixels memo-hit with the fresh text on the next batch.
    The per-frame output contract (every field carries text) holds via the
    per-slot cache for previously-seen fields."""
    import numpy as np

    from manual_yolo_tpu.runtime.fieldocr import FieldOCRMemo

    calls = []

    class Eng:
        def read_fields(self, crops, names, min_confidence=0.35):
            calls.append(len(crops))
            return [f"T{len(calls)}-{i}" for i in range(len(crops))]

    memo = FieldOCRMemo(Eng(), async_reads=True)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (200, 300, 3), np.uint8)
    dets = [{"class_name": "my_stack", "class_id": 7,
             "bbox": [40, 40, 120, 70], "conf": 0.9, "ocr_text": ""}]
    try:
        memo.process([frame], [dets])
        assert dets[0]["ocr_text"] == ""  # read in flight, first sighting
        memo.flush()
        assert calls == [1]
        dets2 = [dict(dets[0], ocr_text="")]
        memo.process([frame], [dets2])
        assert dets2[0]["ocr_text"] == "T1-0"  # memo hit with landed text
        assert memo.fields_read == 1 and memo.fields_memo == 1
        # changed pixels: new read dispatched, but the field still carries
        # the PREVIOUS text this batch (per-slot cache fallback)
        frame2 = frame.copy()
        frame2[40:70, 40:120] = 255 - frame2[40:70, 40:120]
        dets3 = [dict(dets[0], ocr_text="")]
        memo.process([frame2], [dets3])
        assert dets3[0]["ocr_text"] == "T1-0"
        memo.flush()
        dets4 = [dict(dets[0], ocr_text="")]
        memo.process([frame2], [dets4])
        assert dets4[0]["ocr_text"] == "T2-0"
    finally:
        memo.close()

"""LLM-fallback host path: collage building, JSON parsing, offline gating."""

import numpy as np
import pytest

from manual_yolo_tpu.runtime import llm_fallback as llm


def test_build_collage_layout():
    cv2 = pytest.importorskip("cv2")
    crops = [
        ("card1_rank", np.full((20, 30, 3), 200, np.uint8)),
        ("my_stack", np.full((15, 50, 3), 100, np.uint8)),
        ("empty", None),
    ]
    collage = llm.build_collage(crops)
    assert collage is not None and collage.ndim == 3
    assert llm.build_collage([]) is None


def test_parse_llm_json_variants():
    assert llm.parse_llm_json('{"card1_rank": "A"}') == {"card1_rank": "A"}
    embedded = 'Sure! Here is the data:\n```{"my_stack": "1500"}```'
    assert llm.parse_llm_json(embedded) == {"my_stack": "1500"}
    assert llm.parse_llm_json("no json here") == {}
    assert llm.parse_llm_json("[1, 2]") == {}


def test_query_disabled_without_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    out = llm.query_vision_llm(np.zeros((10, 10, 3), np.uint8), ["my_stack"])
    assert out == {}


def test_important_keys_match_reference_surface():
    # the escalation set mirrors yolo.py:51-59
    assert "total_pot" in llm.IMPORTANT_KEYS
    assert "villian5_bet" in llm.IMPORTANT_KEYS
    assert len([k for k in llm.IMPORTANT_KEYS if k.startswith("villian")]) == 15

"""Game-state machine, text normalisation, and result-schema parity tests.

Golden target: the reference's shipped ``poker_result.json`` structure and
the ``detect.py`` game-state dict shape.
"""

import json
import os

import pytest

from manual_yolo_tpu.game import schema, state, taxonomy
from manual_yolo_tpu.game.text import (
    clean_rank,
    extract_card_value,
    extract_name,
    extract_numeric_value,
    normalize_rank_text,
    suit_char,
    suit_phrase,
)


def test_taxonomy_matches_reference_yaml(reference_root):
    import yaml

    with open(os.path.join(reference_root, "roadmap1.v3i.yolov8", "data.yaml")) as f:
        data = yaml.safe_load(f)
    assert list(taxonomy.CLASS_NAMES) == data["names"]
    assert len(taxonomy.CLASS_NAMES) == data["nc"] == 64


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("A", "A"), ("k", "K"), ("10", "10"), ("T", "10"), ("0", "10"),
        ("O", "10"), ("|", ""), ("Z", "2"), ("B", "8"), ("S", "5"),
        ("7", "7"), ("", ""), ("xx", ""), ("11", ""), ("1", ""),
        (" Q ", "Q"),
    ],
)
def test_normalize_rank_text(raw, expect):
    assert normalize_rank_text(raw) == expect


def test_clean_rank():
    assert clean_rank("0") == "Q"
    assert clean_rank("x") == "K"
    assert clean_rank("a") == "A"
    assert clean_rank("") == ""


def test_extract_card_value():
    assert extract_card_value("As") == "As"
    assert extract_card_value("10h") == "Th"
    assert extract_card_value("Q♦") == "Qd"
    assert extract_card_value("garbage") is None
    assert extract_card_value("K c") == "Kc"


def test_extract_numeric_and_name():
    assert extract_numeric_value("$1,500") == "1500"
    assert extract_numeric_value("1.2k") == "1.2K"  # reference uppercases first
    assert extract_numeric_value("O.5M") == "0.5M"
    assert extract_numeric_value("xyz") is None
    assert extract_name("Player_1") == "Player_1"
    assert extract_name("x") is None  # too short
    # beyond the reference's ^[a-zA-Z0-9_]{2,25}$: real usernames carry
    # interior dots/hyphens ("s.kaahyap" in the labelled real crops)
    assert extract_name("s.kaahyap") == "s.kaahyap"
    assert extract_name("top-gun99") == "top-gun99"
    assert extract_name(".hidden") is None  # no leading/trailing separator
    assert extract_name("trail.") is None
    assert extract_name("0") is None  # single char still rejected


def test_suit_helpers():
    assert suit_phrase("flop1_suite_spades") == "of spade"
    assert suit_phrase("card1_suite_heart") == "of heart"
    assert suit_char("turn_suite_club") == "c"


def test_game_state_schema_matches_reference():
    g = state.new_game_state(1)
    assert set(g) == {
        "game_id", "game_state", "villains", "hero", "board", "pot", "ui"
    }
    assert [c["rank"] for c in g["board"]["flop"]] == ["", "", ""]
    assert set(g["ui"]["buttons"]) == {"fold", "check", "call", "raise", "bet", "allin"}


def test_street_resolution():
    mk = lambda n, t: {"class_name": n, "ocr_text": t}
    assert state.resolve_street([]) == "preflop"
    flop = [mk(f"flop{i}_rank", "A") for i in (1, 2, 3)]
    assert state.resolve_street(flop) == "flop"
    assert state.resolve_street(flop + [mk("turn_rank", "5")]) == "turn"
    assert state.resolve_street([mk("river_rank", "9")]) == "river"
    # unreadable ranks don't advance the street
    assert state.resolve_street([mk("turn_rank", "")]) == "preflop"


def test_game_tracker_new_game_rollover(tmp_path):
    tr = state.GameTracker(output_dir=str(tmp_path))
    d1 = [
        {"class_name": "card1_rank", "ocr_text": "A", "bbox": [1, 2, 3, 4]},
        {"class_name": "card1_suite_spades", "ocr_text": "", "bbox": []},
        {"class_name": "my_stack", "ocr_text": "1500", "bbox": []},
    ]
    s = tr.update(d1)
    assert s["hero"]["cards"][0] == {"rank": "A", "suit": "of spade"}
    assert s["hero"]["stack"] == "1500"
    assert tr.game_id == 1

    # new hole cards -> previous game saved, id incremented
    d2 = [{"class_name": "card1_rank", "ocr_text": "K", "bbox": []}]
    s2 = tr.update(d2)
    assert tr.game_id == 2
    assert s2["hero"]["cards"][0]["rank"] == "K"
    assert (tmp_path / "game_1.json").exists()
    saved = json.loads((tmp_path / "game_1.json").read_text())
    assert saved["hero"]["cards"][0]["rank"] == "A"


def test_villain_routing():
    g = state.new_game_state(1)
    state.apply_detections(
        g,
        [
            {"class_name": "villian2_name", "ocr_text": "bob", "bbox": []},
            {"class_name": "villian2_stack", "ocr_text": "900", "bbox": []},
            {"class_name": "villian2_bet", "ocr_text": "50", "bbox": []},
        ],
    )
    assert g["villains"] == [
        {"position": "2", "name": "bob", "stack": "900", "bet": "50"}
    ]


def test_build_result_schema_matches_golden(reference_root):
    golden = json.loads(
        open(os.path.join(reference_root, "poker_result.json")).read()
    )
    detected = {
        "card1_rank": "A", "card1_suit": "s", "card2_rank": "K", "card2_suit": "h",
        "flop1_rank": "2", "flop1_suit": "c", "my_stack": "100", "total_pot": "55",
        "buttons": [{"button": "button_fold", "center": [10, 10]}],
    }
    result = schema.build_result(detected)
    assert set(result) == set(golden)
    assert set(result["game_info"]) == set(golden["game_info"])
    assert set(result["my_cards"]) == set(golden["my_cards"])
    assert set(result["my_info"]) == set(golden["my_info"])
    assert len(result["villains"]) == 5
    assert set(result["villains"][0]) == set(golden["villains"][0])
    assert result["my_cards"]["card1"] == "As"
    assert result["game_info"]["game_state"] == "FLOP"
    assert result["community_cards"] == ["2c"]


def test_build_hand_record_schema():
    rec = schema.build_hand_record(
        3,
        [{"track_id": 1, "class": "button_fold", "bbox": {"x1": 1, "y1": 2, "x2": 3, "y2": 4}}],
        None,
        hand_start_ts=None,
    )
    assert set(rec) == {"hand_index", "time_start", "time_end", "buttons", "iinput_field"}
    assert rec["iinput_field"] is None
    assert rec["buttons"][0]["class"] == "button_fold"


def test_write_json_atomic(tmp_path):
    p = str(tmp_path / "out" / "r.json")
    schema.write_json_atomic(p, {"a": 1})
    assert json.loads(open(p).read()) == {"a": 1}
    schema.write_json_atomic(p, {"a": 2})
    assert json.loads(open(p).read()) == {"a": 2}


def test_merge_detected_values_semantics():
    from manual_yolo_tpu.game.accumulate import merge_detected_values

    existing = {"card1_rank": "A", "my_stack": "1000", "buttons": [{"b": 1}]}
    new = {"card1_rank": "K", "card2_rank": "Q", "my_stack": "1200", "buttons": []}
    merged, changes = merge_detected_values(existing, new)
    # card fields are fill-only: existing A survives, empty card2 fills
    assert merged["card1_rank"] == "A"
    assert merged["card2_rank"] == "Q"
    assert "card2_rank" in changes["cards_filled"]
    # non-card fields update on change
    assert merged["my_stack"] == "1200"
    assert "my_stack" in changes["other_updated"]
    # empty new buttons list does NOT clobber existing buttons
    assert merged["buttons"] == [{"b": 1}]
    # non-empty buttons replace wholesale
    merged2, _ = merge_detected_values(merged, {"buttons": [{"b": 2}]})
    assert merged2["buttons"] == [{"b": 2}]

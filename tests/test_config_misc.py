"""Coverage for config, profiling, capture, and weights helpers."""

import json
import os
import time

import numpy as np
import pytest

from manual_yolo_tpu.config import AppConfig
from manual_yolo_tpu.utils.profiling import StageTimer


def test_config_defaults_match_reference_constants():
    cfg = AppConfig()
    # detect.py:18 region; pipe.py:36/41/42; detect.py:129-131 thresholds
    assert (cfg.region.top, cfg.region.left) == (48, 970)
    assert cfg.pipe.input_fps == 6
    assert cfg.pipe.yolo_imgsz == 1280
    assert cfg.pipe.yolo_conf == 0.35
    assert cfg.pipe.hand_timeout == 6.0
    assert cfg.rank.conf_threshold == 0.40
    assert cfg.rank.turn_river_threshold == 0.20
    assert cfg.ocr.min_confidence == 0.35
    assert cfg.live.screenshot_interval == 0.5


def test_config_load_and_override(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"detector": {"imgsz": 512}, "pipe": {"input_fps": 10}}))
    cfg = AppConfig.load(str(p), live={"output_folder": "/tmp/x"})
    assert cfg.detector.imgsz == 512
    assert cfg.pipe.input_fps == 10
    assert cfg.live.output_folder == "/tmp/x"
    # untouched defaults survive
    assert cfg.detector.iou == 0.7
    d = cfg.to_dict()
    assert d["pipe"]["input_fps"] == 10


def test_config_ignores_unknown_keys(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"nonsense": 1, "detector": {"bogus": 2, "conf": 0.3}}))
    cfg = AppConfig.load(str(p))
    assert cfg.detector.conf == 0.3


def test_stage_timer_stats():
    t = StageTimer()
    for _ in range(3):
        with t.stage("x"):
            time.sleep(0.002)
    s = t.stats()["x"]
    assert s["n"] == 3 and s["mean_ms"] >= 1.5
    t.start("y"); t.stop("y")
    assert "y" in t.stats()
    assert json.loads(t.report())["x"]["n"] == 3


def test_capture_file_and_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from manual_yolo_tpu.runtime.capture import file_source, make_source

    img = np.random.default_rng(0).integers(0, 255, (32, 48, 3), np.uint8)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"f{i}.png"), img)
    frames = list(file_source(str(tmp_path)))
    assert len(frames) == 3 and frames[0].shape == (32, 48, 3)
    one = next(make_source(str(tmp_path / "f0.png")))
    assert one.shape == (32, 48, 3)


def test_fold_batchnorm_math():
    from manual_yolo_tpu.core.weights import fold_batchnorm

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)  # OIHW
    g = rng.uniform(0.5, 2, 4).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    m = rng.normal(size=4).astype(np.float32)
    v = rng.uniform(0.5, 2, 4).astype(np.float32)
    wf, bf = fold_batchnorm(w, g, b, m, v, eps=1e-3)
    assert wf.shape == (3, 3, 3, 4)  # HWIO
    # for a zero conv output the folded bias must equal beta - gamma*mean/sqrt(var+eps)
    np.testing.assert_allclose(bf, b - m * g / np.sqrt(v + 1e-3), rtol=1e-5)


def test_cli_consumes_config_file(tmp_path, monkeypatch):
    """The shot CLI must source its defaults from AppConfig: a --config file
    changes what reaches the pipeline; explicit flags still override."""
    import manual_yolo_tpu.runtime.shot as shot_mod

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "detector": {"imgsz": 512, "iou": 0.55, "weights": "custom_det.npz"},
        "rank": {"weights": "custom_cls.npz"},
    }))
    seen = {}

    def fake_load(detector, classifier, imgsz, conf, iou, compute_dtype):
        seen.update(detector=detector, classifier=classifier, imgsz=imgsz,
                    conf=conf, iou=iou, dtype=compute_dtype)
        return object()

    def fake_process(pipeline, image, output_json, output_image, **kw):
        seen["image"] = image
        return {"ok": True}

    monkeypatch.setattr(shot_mod, "load_fused_pipeline", fake_load)
    monkeypatch.setattr(shot_mod, "process_screenshot", fake_process)
    from manual_yolo_tpu.cli import shot as shot_cli

    rc = shot_cli.main([
        "--image", "x.png", "--config", str(cfg_path), "--no-ocr",
        "--conf", "0.9",  # flag overrides config
    ])
    assert rc == 0
    assert seen["imgsz"] == 512 and seen["iou"] == 0.55
    assert seen["detector"] == "custom_det.npz"
    assert seen["classifier"] == "custom_cls.npz"
    assert seen["conf"] == 0.9


def test_live_loop_stage_timer_populates(tmp_path):
    """Runtime loops must actually feed the profiling subsystem."""
    from manual_yolo_tpu.runtime.live import LiveLoop

    class _P:
        def process_frame(self, frame):
            return [{"class_id": 34, "class_name": "my_stack",
                     "bbox": [1, 1, 20, 10], "conf": 0.8, "ocr_text": ""}]

    loop = LiveLoop(pipeline=_P(), output_dir=str(tmp_path))
    loop.step(np.zeros((32, 32, 3), np.uint8))
    loop.close()
    stats = loop.timer.stats()
    assert {"infer", "track", "persist"} <= set(stats)
    assert stats["infer"]["n"] == 1

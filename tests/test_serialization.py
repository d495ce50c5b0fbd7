"""Native npz checkpoint format round-trip tests."""

import os
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.core.serialization import load_params, save_params  # noqa: E402


def test_roundtrip_nested(tmp_path):
    params = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": [
            {"w": np.ones((2, 2), np.float32), "i": np.asarray(3, np.int64)},
            {"w": np.zeros((1,), np.float32)},
        ],
        "c": (np.full((2,), 7.0, np.float32),),
    }
    p = str(tmp_path / "x.npz")
    save_params(p, params, meta={"names": {0: "A"}, "k": 1})
    loaded, meta = load_params(p)
    assert meta["k"] == 1 and meta["names"]["0"] == "A" or meta["names"].get(0) == "A"
    assert isinstance(loaded["b"], list) and isinstance(loaded["c"], tuple)
    np.testing.assert_allclose(loaded["a"], params["a"])
    np.testing.assert_allclose(loaded["b"][0]["w"], 1.0)
    assert loaded["b"][0]["i"] == 3


def test_fp16_storage_fp32_load(tmp_path):
    params = [{"w": np.random.rand(8, 8).astype(np.float32)}]
    p = str(tmp_path / "y.npz")
    save_params(p, params)  # stores fp16
    loaded, _ = load_params(p)
    assert loaded[0]["w"].dtype == np.float32
    np.testing.assert_allclose(loaded[0]["w"], params[0]["w"], atol=1e-3)


def test_atomic_overwrite(tmp_path):
    p = str(tmp_path / "z.npz")
    save_params(p, [np.zeros(3, np.float32)])
    save_params(p, [np.ones(3, np.float32)])
    loaded, _ = load_params(p)
    np.testing.assert_allclose(loaded[0], 1.0)


def test_jax_arrays_serializable(tmp_path):
    params = {"w": jnp.ones((4, 4)), "nested": [jnp.zeros((2,))]}
    p = str(tmp_path / "j.npz")
    save_params(p, params)
    loaded, _ = load_params(p)
    np.testing.assert_allclose(loaded["w"], 1.0)


def test_resolve_weight_path_falls_back_to_repo_root(tmp_path, monkeypatch):
    """CLI defaults like 'weights/x.npz' must resolve when the process CWD
    is outside the repo (package-boundary invocation)."""
    from manual_yolo_tpu.core.serialization import resolve_weight_path

    monkeypatch.chdir(tmp_path)
    p = resolve_weight_path("weights/poker_detector.npz")
    assert os.path.isabs(p) and os.path.exists(p)
    # absolute and existing-relative paths pass through untouched
    assert resolve_weight_path(str(tmp_path)) == str(tmp_path)
    (tmp_path / "local.npz").write_bytes(b"x")
    assert resolve_weight_path("local.npz") == "local.npz"
    # missing everywhere: returned as-is (caller raises its own error)
    assert resolve_weight_path("nope/missing.npz") == "nope/missing.npz"

"""Native npz checkpoint format round-trip tests."""

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

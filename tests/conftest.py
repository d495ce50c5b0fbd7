"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on a virtual 8-device CPU mesh per the project test strategy
(SURVEY.md §2c).

IMPORTANT (this environment): the axon TPU plugin is force-registered by a
``sitecustomize.py`` on PYTHONPATH at interpreter boot and overrides
JAX_PLATFORMS. To get a REAL CPU run (and not contend with TPU jobs),
launch pytest via ``./run_tests.sh`` which strips the plugin path:

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python -m pytest tests/

The env hard-set below covers environments without the plugin.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


def pytest_configure(config):
    import jax

    # the axon TPU plugin (when present) sets jax_platforms="axon,cpu" at
    # interpreter boot; force the test suite onto CPU regardless
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    # persistent XLA compile cache: repeat suite runs skip recompilation
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference assets not available")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def rank_ckpt_path(reference_root):
    p = os.path.join(reference_root, "rank_classifier.pt")
    if not os.path.exists(p):
        pytest.skip("rank_classifier.pt not available")
    return p


@pytest.fixture(scope="session")
def rank_ckpt(rank_ckpt_path):
    from manual_yolo_tpu.core.weights import load_torch_checkpoint

    return load_torch_checkpoint(rank_ckpt_path)


@pytest.fixture(scope="session")
def rank_clf(rank_ckpt):
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.models.classifier import RankClassifier

    spec = yolov8.build_spec("classify", "n", 13)
    params = yolov8.import_torch_state(rank_ckpt.state, spec, fold=True)
    return RankClassifier(params, spec, rank_ckpt.names)

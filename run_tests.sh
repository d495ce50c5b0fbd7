#!/bin/sh
# Run the test suite on REAL CPU (8 virtual devices for sharding tests).
# In this environment a sitecustomize.py on PYTHONPATH force-registers the
# TPU plugin and overrides JAX_PLATFORMS; stripping it is the only way to
# keep tests off the (possibly busy) TPU chip.
cd "$(dirname "$0")"
exec env JAX_PLATFORMS=cpu PYTHONPATH="$(pwd)" \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"

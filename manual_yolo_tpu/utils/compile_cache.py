"""Persistent JAX compilation cache, shared by every heavy entry point.

The repo commits ``.jax_cache/`` (regenerated from the final code each
round) so a fresh checkout starts with warm client-side lowering: the
cache hits across processes (measured, tools/cache_probe.py). Note the
limits measured in docs/BENCH_NOTES.md — through the tunnelled runtime the
TERMINAL still compiles every program at its first execution per process,
so this cache removes the client lowering cost (~0.4-21 s/program), not
the terminal compile wave; ``prewarm_async`` overlapping handles the
latter.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def enable_repo_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax's persistent compilation cache at the repo's committed
    ``.jax_cache`` (or ``cache_dir``). Threshold 1 s: the many small
    per-bucket decode programs compile in seconds each, and on a cold
    start every saved compile is budget."""
    import jax

    path = cache_dir or os.path.join(_REPO_ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return path

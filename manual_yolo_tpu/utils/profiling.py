"""Tracing / profiling — a first-class aux subsystem the reference lacks.

The reference's only observability is a per-frame FPS print
(``detect.py:696-697``; SURVEY.md §5 "Tracing/profiling: none"). Here:

  * ``StageTimer`` — rolling per-stage wall-time stats for the runtime
    loops (capture / infer / track / ocr / persist);
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace;
  * ``device_memory_stats`` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict, deque
from typing import Dict, Iterator, Optional


class StageTimer:
    """Rolling mean/max wall times per named stage."""

    def __init__(self, window: int = 120):
        self._samples: Dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._starts: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def start(self, name: str):
        self._starts[name] = time.perf_counter()

    def stop(self, name: str):
        if name in self._starts:
            self._samples[name].append(time.perf_counter() - self._starts.pop(name))

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            if not xs:
                continue
            s = sorted(xs)
            out[name] = {
                "mean_ms": 1000 * sum(xs) / len(xs),
                "p50_ms": 1000 * s[len(s) // 2],
                "max_ms": 1000 * s[-1],
                "n": len(xs),
            }
        return out

    def report(self) -> str:
        return json.dumps(self.stats(), indent=2)


@contextlib.contextmanager
def trace(logdir: str = "runs_tpu/traces") -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    import jax

    out = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
        except Exception:
            ms = None
        if ms:
            out[str(d)] = {
                "bytes_in_use": int(ms.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(ms.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(ms.get("bytes_limit", 0)),
            }
    return out

"""Do terminal-side compiles of DIFFERENT programs overlap?

PALLAS_AXON_REMOTE_COMPILE=1 means the terminal compiles each program at
(or after) client compile time, and the client only blocks at the first
value fetch (tools/firstexec_probe.py: dispatch 0.02s, first fetch 505s
under CPU contention). If the terminal pipeline processes compile
requests CONCURRENTLY (or at least accepts them all before the first
finishes), the bench can warm every program in one overlapped wave:

    for p in programs: p.lower().compile(); p(args)   # async, no fetch
    ... host-side setup work ...
    for p in programs: fetch(p)                        # total = max, not sum

This probe times that pattern on the three biggest bench programs
(compute_fused, detect_skip, classify) plus a small decode program:
dispatch all four back to back, then fetch in submission order. If
fetch k+1 returns ~instantly after fetch k's long wait, the terminal
overlapped them; if each fetch pays its own full compile, it is a
serial queue (still fine: the client at least never serializes).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    os.environ.setdefault("MYOLO_BENCH_BATCH", "64")
    import jax
    import numpy as np

    import bench

    bench._enable_compile_cache()
    t0 = time.perf_counter()
    stream = bench.build_stream()
    print(f"build_stream {time.perf_counter() - t0:.2f}s", flush=True)

    progs = [
        ("compute_fused", stream._compute_fused,
         (stream.det_params, stream.cls_params, stream._dev_prev,
          stream._dev_pred_crops)),
        ("detect_skip", stream._detect_skip,
         (stream.det_params, stream._dev_prev)),
        ("classify", stream._classify,
         (stream.cls_params, stream._dev_pred_crops)),
    ]

    outs = []
    for name, fn, args in progs:
        t0 = time.perf_counter()
        c = fn.lower(*args).compile()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = c(*args)
        t_d = time.perf_counter() - t0
        outs.append((name, out))
        print(f"{name}: client-compile {t_c:.2f}s dispatch {t_d:.2f}s",
              flush=True)

    for name, out in outs:
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        print(f"{name}: first fetch {time.perf_counter() - t0:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()

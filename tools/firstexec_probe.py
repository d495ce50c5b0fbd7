"""Where does the fresh-process cost of a WARM-cached big program go?

Round-3/4 diagnosis: with the persistent JAX compile cache fully warm,
a fresh bench process still spends 35-200 s before its first big-program
result (bench warm batch 3 "collect 100.6s"). Candidates:

  (a) client-side cache deserialize (zstd + flatbuffer decode);
  (b) shipping the executable image through the degraded relay
      (entries are 10-24 MB compressed);
  (c) the terminal recompiling anyway (PALLAS_AXON_REMOTE_COMPILE=1
      sends HLO; the client cache may be irrelevant server-side);
  (d) first-execution lazy loading on the terminal.

This probe times each stage separately for the EXACT bench program
(`BatchStream._compute_fused` at the bench batch size): lower,
compile (persistent-cache hit path), first exec ending in a 4-byte
value fetch, then a second exec+fetch. jax.block_until_ready lies
through the tunnel (docs/BENCH_NOTES.md), so every exec measurement
ends in a value fetch.

Run it in a fresh process each time:

    python tools/firstexec_probe.py            # remote_compile=1 (env default)
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    os.environ.setdefault("MYOLO_BENCH_BATCH", "64")
    t_imp0 = time.perf_counter()
    import jax
    import numpy as np

    import bench

    bench._enable_compile_cache()
    print(f"import+cacheconf {time.perf_counter() - t_imp0:.2f}s",
          flush=True)

    t0 = time.perf_counter()
    stream = bench.build_stream()
    print(f"build_stream {time.perf_counter() - t0:.2f}s", flush=True)

    args = (stream.det_params, stream.cls_params, stream._dev_prev,
            stream._dev_pred_crops)

    t0 = time.perf_counter()
    lowered = stream._compute_fused.lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"lower {t_lower:.2f}s compile(cache-hit path) {t_compile:.2f}s",
          flush=True)

    t0 = time.perf_counter()
    out = compiled(*args)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    t_fetch1 = time.perf_counter() - t0
    print(f"first dispatch {t_dispatch:.2f}s first value-fetch "
          f"{t_fetch1:.2f}s", flush=True)

    t0 = time.perf_counter()
    out = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    print(f"second exec+fetch {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    out = compiled(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    print(f"third exec+fetch {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

"""Cross-process persistent-compile-cache probe.

Resolves the BENCH_NOTES contradiction ("the JAX persistent cache never
hits" at line 91 vs "one-time cost" at line 170): compiles a fixed conv
program in THIS process with the persistent cache enabled, reports the
wall time and the cache-dir delta. Run it twice in fresh processes:

    python tools/cache_probe.py           # process 1: cold or warm?
    python tools/cache_probe.py           # process 2: must be warm

If process 2 is still slow, the entries are process-unique and the bench
must AOT-serialize executables instead of relying on the cache.
"""

import glob
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".jax_cache_probe")


def entries():
    return sorted(os.path.basename(p) for p in glob.glob(CACHE + "/*"))


def main():
    os.makedirs(CACHE, exist_ok=True)
    before = entries()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    def f(x, w):
        for _ in range(12):
            x = jax.nn.silu(
                jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return x.sum()

    x = jnp.zeros((8, 128, 128, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
    fj = jax.jit(f)
    t0 = time.perf_counter()
    lowered = fj.lower(x, w)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    val = float(compiled(x, w))
    t_exec = time.perf_counter() - t0
    after = entries()
    print(f"lower {t_lower:.2f}s compile {t_compile:.2f}s "
          f"first-exec {t_exec:.2f}s val {val}")
    print(f"cache entries before={len(before)} after={len(after)} "
          f"new={[e for e in after if e not in before]}")


if __name__ == "__main__":
    main()

"""MFU vs channel width on the real chip — test the round-4 hypothesis
that YOLOv8s's 32/64-channel stages under-occupy the 128-lane MXU, and
measure the candidate remedy (space-to-depth folding of stride-2 convs:
4x the input channels at the same FLOPs, exact when weights are
rearranged to a 2x2 kernel over phase-split inputs).

Slope-timed (docs/BENCH_NOTES.md measurement-honesty protocol: every run
ends in a value fetch; per-exec = slope between reps and 2*reps runs).

Usage: python tools/mfu_width_probe.py   (real TPU; ~2 min)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp

    def timed(fn, *a, reps=30):
        float(np.asarray(fn(*a)).ravel()[0])  # warm + sync

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*a)
            float(np.asarray(out).ravel()[0])
            return time.perf_counter() - t0

        t1, t2 = run(reps), run(2 * reps)
        return max(t2 - t1, 1e-9) / reps

    key = jax.random.PRNGKey(0)

    # --- part 1: equal-FLOP 3x3 convs at different widths -----------------
    # fix FLOPs ~= 2*9*C^2*H*W by scaling H*W inversely with C^2
    print("width sweep (3x3 conv, ~equal FLOPs, bf16):")
    for C, HW in ((32, 512), (64, 256), (128, 128), (256, 64)):
        x = jax.random.normal(key, (8, HW, HW, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        dt = timed(conv, x, w)
        fl = 2 * 9 * C * C * HW * HW * 8
        print(f"  C={C:4d} HW={HW:4d}: {dt*1e3:7.3f} ms  "
              f"{fl/dt/1e12:6.1f} TFLOP/s  MFU {fl/dt/1e12/PEAK_TFLOPS:.3f}")

    # --- part 2: stride-2 stem conv vs exact space-to-depth fold ----------
    # baseline: 3x3 stride-2 conv Cin=32 -> 64 at 320x320 (the YOLOv8s
    # layer-2 shape); folded: phase-split input (160,160,128) + 2x2 conv
    # with rearranged weights — identical arithmetic graph-wise
    Cin, Cout, H = 32, 64, 320
    x = jax.random.normal(key, (8, H, H, Cin), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16)

    @jax.jit
    def stride2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def fold_weights(w):
        # output tap at (2i, 2j) reads input rows/cols 2i-1..2i+1: phase
        # p=(di%2, dj%2) of the space-to-depth input, kernel pos (ki, kj)
        # with ki = (di+1)//2 over di in {-1, 0, 1}
        k, _, ci, co = w.shape
        w4 = np.zeros((2, 2, 4 * ci, co), np.float32)
        wn = np.asarray(w, np.float32)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                # padded row 2i+(di+1): cell i+(di+1)//2, phase (di+1)%2
                p = ((di + 1) % 2) * 2 + ((dj + 1) % 2)
                ki, kj = (di + 1) // 2, (dj + 1) // 2
                w4[ki, kj, p * ci : (p + 1) * ci] += wn[di + 1, dj + 1]
        return jnp.asarray(w4, jnp.bfloat16)

    def s2d(x):
        n, h, wd, c = x.shape
        x = x.reshape(n, h // 2, 2, wd // 2, 2, c)
        return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            n, h // 2, wd // 2, 4 * c
        )

    w4 = fold_weights(w)

    @jax.jit
    def folded(x, w4):
        # pad so phase 0 aligns with the stride-2 grid (SAME padding of
        # the stride-2 conv reads row -1), then 2x2 VALID conv
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xs = s2d(xp)
        return jax.lax.conv_general_dilated(
            xs, w4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    a = np.asarray(stride2(x, w), np.float32)
    b = np.asarray(folded(x, w4), np.float32)[:, : a.shape[1], : a.shape[2]]
    err = np.abs(a - b).max() / max(1e-6, np.abs(a).max())
    t_base = timed(stride2, x, w)
    t_fold = timed(folded, x, w4)
    fl = 2 * 9 * Cin * Cout * (H // 2) * (H // 2) * 8
    print(f"\nstride-2 stem {Cin}->{Cout} @ {H}: base {t_base*1e3:.3f} ms "
          f"(MFU {fl/t_base/1e12/PEAK_TFLOPS:.3f}) vs s2d-folded "
          f"{t_fold*1e3:.3f} ms (MFU {fl/t_fold/1e12/PEAK_TFLOPS:.3f}); "
          f"rel err {err:.2e}")


if __name__ == "__main__":
    main()

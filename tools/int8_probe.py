"""int8 inference feasibility on the real chip — the last untried MFU
lever from the r4 roofline (docs/BENCH_NOTES.md "MFU remedy experiment").

v5e's MXU runs int8 at 2x the bf16 peak (394 vs 197 TOPS), so if XLA
lowers s8 x s8 -> s32 convs onto the MXU, the deep 256/512-channel
YOLOv8s stages (the ones already near full lane occupancy, where most
FLOPs live) could halve their time. This probe times the real deep-stage
shapes (batch 64 @ 640 px network: C=128 @ 80^2, C=256 @ 40^2,
C=512 @ 20^2) three ways:

  - bf16 conv (today's path),
  - int8 conv -> s32 accumulator (pure kernel),
  - int8 conv -> s32 -> per-channel dequant + SiLU in bf16 (what a real
    w8a8 layer would run, requant epilogue fused by XLA or not).

Timing is STALL-ROBUST for degraded-terminal nights (where host-side
slope timing returns unusable slopes — see the s2d experiment's caveat):
the repetition loop runs ON DEVICE via ``lax.scan`` feeding the conv's
output back as its input, so one dispatch + one value fetch covers N
body iterations and multi-second tunnel stalls never enter the measured
region. Per-iter cost = slope between an N-iter and a 2N-iter scan
(cancels program overhead), min over 3 samples (a stall can only
inflate a sample, never deflate it).

Usage: python tools/int8_probe.py   (real TPU; ~2 min)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PEAK_BF16 = 197.0  # v5e TFLOP/s
PEAK_INT8 = 394.0  # v5e TOPS


def main():
    import jax
    import jax.numpy as jnp

    from jax import lax

    def scan_timer(body):
        """Build jitted fns running ``body`` n times on device (output
        fed back as input), return per-iter seconds via the n/2n slope,
        min over 3 samples."""
        def looped(n):
            @jax.jit
            def run(x, w, extra):
                def step(carry, _):
                    return body(carry, w, extra), 0
                y, _ = lax.scan(step, x, None, length=n)
                # 4-byte readback: the value fetch is the sync point, and
                # fetching the full 26 MB output would add seconds of
                # tunnel variance that drowns the slope
                return y[0, 0, 0, 0].astype(jnp.float32)
            return run

        # seconds-long measured regions: a ~0.1-0.3 ms body x512/1024
        # iters runs 0.05-0.3 s, so the night's ~30 ms crossings and
        # occasional stalls are small AND slope-cancelled
        N = 512
        r1, r2 = looped(N), looped(2 * N)

        def per_iter(x, w, extra):
            # warm both programs (compile + first exec), sync by value
            float(np.asarray(r1(x, w, extra)).ravel()[0].astype(np.float32))
            float(np.asarray(r2(x, w, extra)).ravel()[0].astype(np.float32))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(r1(x, w, extra)).ravel()[0]
                      .astype(np.float32))
                t1 = time.perf_counter()
                float(np.asarray(r2(x, w, extra)).ravel()[0]
                      .astype(np.float32))
                t2 = time.perf_counter()
                dt = ((t2 - t1) - (t1 - t0)) / N
                if dt > 0 and (best is None or dt < best):
                    best = dt
            return best if best is not None else float("nan")

        return per_iter

    def body_bf16(x, w, _):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def body_s8(x, w, _):
        acc = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        # requant back to s8 so the carry dtype closes the loop — this is
        # exactly what a real w8a8 layer chain pays anyway
        return jnp.clip(acc >> 7, -128, 127).astype(jnp.int8)

    def body_s8_epi(x, w, scale):
        acc = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.bfloat16) * scale  # per-channel dequant
        y = y * jax.nn.sigmoid(y)  # SiLU epilogue like conv_block
        return jnp.clip(y * 4.0, -127, 127).astype(jnp.int8)  # requant

    key = jax.random.PRNGKey(0)
    B = 16  # per-iter cost is batch-linear; x4 for the bench's B=64
    dn = ("NHWC", "HWIO", "NHWC")

    t_bf16 = scan_timer(body_bf16)
    t_s8 = scan_timer(body_s8)
    t_epi = scan_timer(body_s8_epi)

    print(f"deep-stage conv shapes, batch {B} (x{64 // B} for B=64 cost):")
    for C, HW in ((128, 80), (256, 40), (512, 20)):
        xf = jax.random.normal(key, (B, HW, HW, C), jnp.bfloat16)
        wf = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
        xi = jax.random.randint(key, (B, HW, HW, C), -64, 64, jnp.int8)
        wi = jax.random.randint(key, (3, 3, C, C), -8, 9, jnp.int8)
        scale = jnp.full((C,), 0.01, jnp.bfloat16)

        fl = 2 * 9 * C * C * HW * HW * B
        t_f = t_bf16(xf, wf, None)
        t_i = t_s8(xi, wi, None)
        t_e = t_epi(xi, wi, scale)
        print(f"  C={C:3d} HW={HW:3d}: bf16 {t_f*1e3:7.3f} ms "
              f"({fl/t_f/1e12:5.1f} TF/s, MFU {fl/t_f/1e12/PEAK_BF16:.3f}) | "
              f"s8 {t_i*1e3:7.3f} ms ({fl/t_i/1e12:5.1f} TOP/s, "
              f"MFU {fl/t_i/1e12/PEAK_INT8:.3f}) | "
              f"s8+epi {t_e*1e3:7.3f} ms  speedup {t_f/t_e:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

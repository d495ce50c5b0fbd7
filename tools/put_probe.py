"""Does splitting one device_put into N concurrent puts go faster?

The serving loop uploads ONE flat u8 payload per batch on a dedicated
dispatcher thread (runtime/serving.py) — device_put blocks its calling
thread through this tunnelled client. Round 5 measured that the tunnel
serves CONCURRENT value fetches ~3x faster than serial ones on
crossing-latency-bound nights (the readback prefetch stage exploits
this). This probe asks the symmetric question for uploads: do two/four
threads each putting 1/Nth of the payload finish before one thread
putting all of it?

Protocol: flip the link first (one scalar fetch — serving always runs
post-flip), then time, for payload sizes ~ the bench's (3.3 MB p50):
  - 1 put of S bytes            (today's path)
  - 2 concurrent puts of S/2
  - 4 concurrent puts of S/4
and a latency row of 64 KB puts serial vs concurrent. Each timing ends
when every put's buffer is live on device (block via a 1-element fetch
per array — value fetch is the only honest sync through this client,
see docs/BENCH_NOTES.md "block_until_ready LIES").
"""

import os
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # flip the link: one scalar fetch
    x = jax.device_put(np.ones((8,), np.uint8), dev)
    _ = np.asarray(x)
    print("link flipped (post-flip mode, like serving)", flush=True)

    rng = np.random.default_rng(0)

    def timed_puts(chunks):
        """Put every chunk (one thread per chunk), return wall seconds
        until all buffers are verifiably live (1-byte fetch each)."""
        arrs = [None] * len(chunks)

        def put(i):
            arrs[i] = jax.device_put(chunks[i], dev)

        t0 = time.perf_counter()
        if len(chunks) == 1:
            put(0)
        else:
            ts = [threading.Thread(target=put, args=(i,))
                  for i in range(len(chunks))]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
        for a in arrs:
            _ = np.asarray(a[:1])  # honest sync
        return time.perf_counter() - t0

    for size_mb in (3.25, 6.5):
        size = int(size_mb * 1024 * 1024)
        payload = rng.integers(0, 256, size, dtype=np.uint8)
        for nway in (1, 2, 4):
            per = size // nway
            chunks = [payload[i * per:(i + 1) * per] for i in range(nway)]
            # one throwaway + 3 timed reps; report best and median-ish
            timed_puts(chunks)
            reps = sorted(timed_puts(chunks) for _ in range(3))
            eff = size_mb / reps[1]
            print(f"size {size_mb:5.2f} MB  {nway}-way: "
                  f"reps {[f'{r:.3f}' for r in reps]} s  "
                  f"(med {reps[1]:.3f} s = {eff:.1f} MB/s effective)",
                  flush=True)

    # latency row: 64 KB puts, serial-4 vs concurrent-4
    small = [rng.integers(0, 256, 65536, dtype=np.uint8) for _ in range(4)]
    timed_puts(small[:1])
    t_serial = sorted(
        sum(timed_puts([c]) for c in small) for _ in range(3))[1]
    t_conc = sorted(timed_puts(small) for _ in range(3))[1]
    print(f"4x64KB serial {t_serial:.3f} s vs concurrent {t_conc:.3f} s "
          f"(ratio {t_serial / max(t_conc, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    main()

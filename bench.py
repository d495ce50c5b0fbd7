"""Benchmark: full-pipeline frames/sec/chip at 1920x1200 capture.

North-star metric (BASELINE.json): >200 full-pipeline frames/s/chip on TPU
v5e at parity accuracy. Each frame runs the complete per-frame stack the
reference executes serially via host round-trips: letterbox -> YOLOv8n
detect -> DFL decode -> class-aware NMS (Pallas kernel on TPU) -> rank-crop
gather from the full-res frame -> batched 13-way rank classification ->
per-detection result assembly.

Frames are REAL table screenshots (the reference's test2.png scaled to the
1920x1200 capture size with photometric jitter) so detections/crops/
classification all execute with live data, not empty noise.

Measured on the batched streaming path (runtime/serving.py BatchStream):
tunnel round trips are amortised over 64-frame batches (MYOLO_BENCH_BATCH
overrides) with two batches in flight, so the link, host preprocessing, and device compute overlap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 200.0
SRC_HW = (1200, 1920)
# Batch size trades per-frame latency for throughput: the tunnel charges a
# fixed ~60 ms stall per crossing, and the steady state is ONE put + ONE
# fetch per batch, so bigger batches amortize the stalls over more frames.
# 64 measured ~equal to 32 on strong link episodes (257 vs 247 fps) and
# ~2x better on weak ones (205 vs 98) — the robust default.
BATCH = int(os.environ.get("MYOLO_BENCH_BATCH", "64"))
# raw_active + skip + all 8 segs-mode jitter deltas
WARM_BATCHES = int(os.environ.get("MYOLO_BENCH_WARM", "10"))
MEAS_BATCHES = int(os.environ.get("MYOLO_BENCH_MEAS", "12"))
IN_FLIGHT = 2
# Wall-clock discipline (round-2 lesson: BENCH_r02 rc=124 — the 2x1200 s
# watchdog budget outlived the driver's deadline and a single tunnel stall
# erased the round's number). Attempts are short, the inner process emits a
# valid JSON line after the FIRST successful measurement pass, and the
# watchdog keeps the last line seen so even a mid-run hang still reports.
ATTEMPT_TIMEOUT = int(os.environ.get("MYOLO_BENCH_ATTEMPT_TIMEOUT", "420"))
SOFT_DEADLINE = ATTEMPT_TIMEOUT - 90  # inner: stop starting new phases here
WARMUP_DEADLINE = 240  # inner: abandon remaining warmup compiles here

ROOT = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def make_frames(n: int = 8):
    """Real table frames at capture size (photometric jitter between them)."""
    rng = np.random.default_rng(0)
    base_path = "/root/reference/test2.png"
    try:
        import cv2

        img = cv2.imread(base_path)
        if img is None:
            raise FileNotFoundError(base_path)
        base = cv2.resize(img, (SRC_HW[1], SRC_HW[0]), interpolation=cv2.INTER_LINEAR)
    except Exception:
        base = rng.integers(0, 255, SRC_HW + (3,), np.uint8).astype(np.uint8)
    frames = []
    for _ in range(n):
        jitter = rng.integers(-6, 7, (1, 1, 3), np.int16)
        frames.append(
            np.clip(base.astype(np.int16) + jitter, 0, 255).astype(np.uint8)
        )
    return frames


def build_stream():
    from manual_yolo_tpu.runtime.serving import BatchStream, load_batch_stream

    det_w = os.path.join(ROOT, "weights", "poker_detector.npz")
    cls_w = os.path.join(ROOT, "weights", "rank_classifier_matched.npz")
    if os.path.exists(det_w) and os.path.exists(cls_w):
        return load_batch_stream(det_w, cls_w, batch=BATCH)

    import jax
    import jax.numpy as jnp

    from manual_yolo_tpu.game import taxonomy
    from manual_yolo_tpu.models import yolov8

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    return BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
        batch=BATCH,
    )


def batch_at(frames, t):
    return [frames[(t + i) % len(frames)] for i in range(BATCH)]


def warmup_stream(stream, frames, deadline: float | None = None,
                  warm_batches: int = WARM_BATCHES) -> int:
    """Compile the delta-mode programs: raw (first batch), skip (repeat),
    then the per-segment mode across several stream deltas so every
    payload-size bucket the stream will hit is compiled before measurement
    starts. ``deadline`` (absolute perf_counter value) bounds the exposure:
    past it the remaining programs compile lazily inside pass 1 — a slower
    first pass but a pass that HAPPENS, instead of a watchdog kill."""
    warmed = 0
    for t in (0, 0, 1, 2, 3, 4, 5, 6, 7, 8)[: max(warm_batches, 3)]:
        stream.submit_batch(batch_at(frames, t))
        warmed += 1
        if stream.in_flight > IN_FLIGHT:
            stream.collect_batch()
        if deadline is not None and time.perf_counter() > deadline:
            break
    while stream.in_flight:
        stream.collect_batch()
    return warmed


def measure_stream(stream, frames, meas_batches=MEAS_BATCHES,
                   resync: int = 0) -> float:
    """End-to-end fps through the batched stream (captures link + host +
    device). The stream EVOLVES batch to batch — slot i of batch t holds
    frame (t+i) mod n, so consecutive batches differ by one step of the
    jittered stream and the delta encoder sees real work every submit
    (never the all-zero easy case a repeated batch would give it).

    Callers must run :func:`warmup_stream` first; ``resync`` adds a couple
    of untimed batches to re-enter steady state between passes."""
    for t in range(resync):
        stream.submit_batch(batch_at(frames, t))
    while stream.in_flight:
        stream.collect_batch()

    done = 0
    lats: list = []
    sub_ts: list = []
    t0 = time.perf_counter()
    for t in range(meas_batches):
        sub_ts.append(time.perf_counter())
        stream.submit_batch(batch_at(frames, t))
        if stream.in_flight > IN_FLIGHT:
            done += len(stream.collect_batch())
            lats.append(time.perf_counter() - sub_ts[len(lats)])
    while stream.in_flight:
        done += len(stream.collect_batch())
        lats.append(time.perf_counter() - sub_ts[len(lats)])
    fps = done / (time.perf_counter() - t0)
    measure_stream.last_latency_ms = (
        round(1e3 * float(np.median(lats)), 1) if lats else None
    )
    return fps


def measure_static_stream(stream, frames, meas_batches=MEAS_BATCHES) -> float:
    """Same pipeline over a STATIC capture (identical frames batch to
    batch) — the workload the r01/early-r02 numbers actually measured, kept
    as a directly comparable companion. The tri-mode encoder's skip path
    uploads nothing here."""
    batch_frames = [frames[i % len(frames)] for i in range(BATCH)]
    for _ in range(2):
        stream.submit_batch(batch_frames)
    while stream.in_flight:
        stream.collect_batch()
    done = 0
    t0 = time.perf_counter()
    for _ in range(meas_batches):
        stream.submit_batch(batch_frames)
        if stream.in_flight > IN_FLIGHT:
            done += len(stream.collect_batch())
    while stream.in_flight:
        done += len(stream.collect_batch())
    return done / (time.perf_counter() - t0)


def measure_compute_only(stream) -> float:
    """Device program throughput with the canvas batch ALREADY resident:
    the framework's own ceiling with the link taken out of the picture
    (detect+NMS+pack per batch; classify excluded — it is ~0.3 ms/frame
    and crop-dependent)."""
    import jax

    # the skip program IS "detect the resident canvas" — already compiled
    # by the warmup, and _dev_prev holds real table content at this point
    out = stream._detect_skip(stream.det_params, stream._dev_prev)
    jax.block_until_ready(out)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = stream._detect_skip(stream.det_params, stream._dev_prev)
    jax.block_until_ready(out)
    return BATCH * reps / (time.perf_counter() - t0)


def probe_link(frames) -> dict:
    """Upload timing for one canvas-sized buffer: natural content vs the
    XOR-delta of a jittered stream (mostly zeros -> compressible in
    transit). Records what the link actually delivers in this environment."""
    import jax
    import jax.numpy as jnp

    a = np.repeat(frames[0][None], 2, 0)[: 2].astype(np.uint8)
    raw = a.reshape(-1)[: BATCH * 640 * 640 * 3 // 8]
    delta = np.bitwise_xor(raw, raw)  # all zeros, same size
    out = {}
    for name, buf in (("raw", raw), ("delta_zero", delta)):
        jax.block_until_ready(jax.device_put(jnp.zeros(4, jnp.uint8)))  # prime
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        dt = time.perf_counter() - t0
        out[f"upload_{name}_MBps"] = round(buf.nbytes / dt / 1e6, 1)
    return out


def run_measurement():
    """Measure and EMIT INCREMENTALLY: a complete, driver-parseable JSON
    line goes out after the FIRST successful measurement pass, and each
    later phase (extra passes, companions) re-emits an enriched line. The
    watchdog keeps only the LAST line, so a hang mid-phase costs the extra
    detail, never the number."""
    import sys

    t_start = time.perf_counter()
    _enable_compile_cache()
    stream = build_stream()
    frames = make_frames()

    record = {
        "metric": "full_pipeline_fps_per_chip_1920x1200",
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
        "batch": BATCH,
    }

    def emit(fps, **extra):
        record["value"] = round(fps, 2)
        record["vs_baseline"] = round(fps / BASELINE_FPS, 3)
        record.update(extra)
        print(json.dumps(record), flush=True)

    def elapsed():
        return time.perf_counter() - t_start

    warmed = warmup_stream(stream, frames,
                           deadline=t_start + WARMUP_DEADLINE)
    print(f"[bench] warmup {warmed} batches in {elapsed():.0f}s",
          file=sys.stderr, flush=True)

    # the tunnel's effective rate varies run to run (docs/BENCH_NOTES.md:
    # 16-70 MB/s episodes); median of up to 3 passes keeps one bad episode
    # from defining the headline — but the FIRST pass already emits
    passes = []
    lat_ms = None
    for i in range(3):
        f = measure_stream(stream, frames, resync=2 if i else 0)
        passes.append(f)
        if f == max(passes):  # latency of the best pass (least stall noise)
            lat_ms = measure_stream.last_latency_ms
        emit(
            float(np.median(passes)),
            passes=[round(p, 2) for p in passes],
            batch_latency_ms_p50=lat_ms,
            delta_modes=dict(stream.mode_counts),
            crop_modes=dict(stream.crop_mode_counts),
        )
        if elapsed() > SOFT_DEADLINE:
            print(f"[bench] soft deadline after pass {i + 1}",
                  file=sys.stderr, flush=True)
            return
    fps = float(np.median(passes))

    # companions, cheapest-first, each guarded by the soft deadline
    if elapsed() <= SOFT_DEADLINE:
        emit(fps, compute_only_fps=round(measure_compute_only(stream), 2))
    if elapsed() <= SOFT_DEADLINE:
        emit(fps, **probe_link(frames))
    if elapsed() <= SOFT_DEADLINE:
        emit(fps, static_stream_fps=round(
            measure_static_stream(stream, frames), 2))


def main():
    """Watchdog wrapper: device_put / fetch / remote-compile calls through
    the tunnel occasionally hang forever (docs/BENCH_NOTES.md), so the
    measurement runs in a subprocess with a per-attempt deadline
    (ATTEMPT_TIMEOUT, default 420 s — two attempts fit well inside the
    driver's budget). The child's stdout is streamed live and every JSON
    line is kept: on success the LAST (richest) line is printed; on a hang
    the child is killed and the last line seen still reports the
    already-measured number. Only a hang before pass 1 costs an attempt."""
    import subprocess
    import sys
    import threading

    if os.environ.get("BENCH_INNER"):
        run_measurement()
        return
    env = dict(os.environ, BENCH_INNER="1")
    last_json: list = []
    for attempt in range(2):
        proc = subprocess.Popen(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, start_new_session=True,
        )

        def _reader(pipe=proc.stdout):
            for ln in pipe:
                ln = ln.rstrip("\n")
                if ln.startswith("{") and ln.endswith("}"):
                    last_json.append(ln)
                else:
                    print(ln, file=sys.stderr, flush=True)

        rt = threading.Thread(target=_reader, daemon=True)
        rt.start()
        try:
            proc.wait(timeout=ATTEMPT_TIMEOUT)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1} exceeded {ATTEMPT_TIMEOUT}s; "
                  f"killing", file=sys.stderr, flush=True)
            proc.kill()
            proc.wait()
        rt.join(timeout=10)
        if last_json:
            print(last_json[-1], flush=True)
            return
        print(f"bench attempt {attempt + 1} rc={proc.returncode}, "
              f"no JSON line", file=sys.stderr, flush=True)
    raise SystemExit(1)


if __name__ == "__main__":
    main()

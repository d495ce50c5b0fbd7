"""Multi-table serving: N independent table streams through ONE BatchStream.

The reference processes a single table per process (`detect.py` loop). A
production deployment reads MANY tables per chip: each batch slot carries
one table's latest frame, so the whole fleet shares one detect program,
one upload, one readback per tick. The delta canvas encoder makes the
steady state cheap — an idle table's slot hits the unchanged-frame memcmp
(no letterbox) and the batch-level skip/tribit modes (few/no bytes on the
link), so per-chip capacity is set by how much actually CHANGES, not by
how many tables are attached.

Default demo mode simulates a realistic fleet from the reference's
`test2.png`: tables are static except for an occasional localized repaint
(a card dealt / a bet updated) and rare global photometric shifts.

  python -m manual_yolo_tpu.cli.serve --tables 16 --ticks 120
  python -m manual_yolo_tpu.cli.serve --tables 8 --source synthetic
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterator, List

import numpy as np


def table_sim_source(
    base_bgr: np.ndarray,
    seed: int = 0,
    repaint_every: float = 0.08,
    photometric_every: float = 0.02,
) -> Iterator[np.ndarray]:
    """A realistic single-table stream: mostly static, occasional localized
    repaint (card/bet region), rare global brightness shift."""
    rng = np.random.default_rng(seed)
    frame = base_bgr.copy()
    h, w = frame.shape[:2]
    while True:
        r = rng.random()
        if r < repaint_every:
            # localized repaint: a card-sized region changes content
            rh, rw = int(h * 0.08), int(w * 0.05)
            y = int(rng.integers(0, h - rh))
            x = int(rng.integers(0, w - rw))
            frame = frame.copy()
            patch = rng.integers(0, 255, (rh, rw, 3), np.uint8)
            frame[y : y + rh, x : x + rw] = patch
        elif r < repaint_every + photometric_every:
            shift = rng.integers(-5, 6, (1, 1, 3), np.int16)
            frame = np.clip(frame.astype(np.int16) + shift, 0, 255).astype(
                np.uint8
            )
        yield frame


def build_sources(spec: str, n: int, hw) -> List[Iterator[np.ndarray]]:
    from manual_yolo_tpu.runtime import capture

    if spec == "table-sim":
        import cv2

        base_path = "/root/reference/test2.png"
        img = cv2.imread(base_path) if os.path.exists(base_path) else None
        if img is None:
            img = np.random.default_rng(0).integers(
                0, 255, hw + (3,), np.uint8
            )
        base = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
        return [table_sim_source(base, seed=i) for i in range(n)]
    if spec == "synthetic":
        return [capture.synthetic_source(hw=hw, seed=i) for i in range(n)]
    # a file/dir/video path: every table replays the same content
    return [capture.make_source(spec, loop=True) for _ in range(n)]


def main(argv=None) -> int:
    from manual_yolo_tpu.config import AppConfig
    from manual_yolo_tpu.runtime.serving import load_batch_stream
    from manual_yolo_tpu.utils.profiling import StageTimer

    cfg = AppConfig.load()
    ap = argparse.ArgumentParser(
        description="Serve N table streams through one batched TPU pipeline"
    )
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=60,
                    help="number of batch ticks to run (0 = forever)")
    ap.add_argument("--source", default="table-sim",
                    help="'table-sim' | 'synthetic' | image/dir/video path")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--detector", default=cfg.detector.weights)
    ap.add_argument("--classifier", default=cfg.rank.weights)
    ap.add_argument("--imgsz", type=int, default=cfg.detector.imgsz)
    ap.add_argument("--conf", type=float, default=cfg.detector.conf)
    ap.add_argument("--out", default="serve_outputs",
                    help="directory for per-table detection JSONL streams "
                         "and game-state JSON files")
    ap.add_argument("--save-every", type=int, default=8,
                    help="persist each table's game_<id>.json every N ticks "
                         "(the reference saves every 0.5 s, detect.py:657)")
    ap.add_argument("--ocr", action="store_true",
                    help="read text fields (stacks/names/pot/game_id) with "
                         "the default OCR engine for tables whose frame "
                         "changed this tick (ranks are always classified "
                         "on-device by the batch pipeline)")
    ap.add_argument("--stats", action="store_true",
                    help="print per-stage timings at exit")
    ap.add_argument("--warmup-ticks", type=int, default=10,
                    help="ticks excluded from the steady-state rate (lazy "
                         "per-bucket program compiles land here; the remote "
                         "compile service never caches across processes)")
    args = ap.parse_args(argv)

    from manual_yolo_tpu.utils.compile_cache import enable_repo_compile_cache

    enable_repo_compile_cache()
    stream = load_batch_stream(
        args.detector, args.classifier, batch=args.tables,
        imgsz=args.imgsz, conf=args.conf,
    )
    sources = build_sources(
        args.source, args.tables, (args.height, args.width)
    )

    from manual_yolo_tpu.game.state import GameTracker
    from manual_yolo_tpu.runtime.native import JsonLog

    os.makedirs(args.out, exist_ok=True)
    logs = [
        JsonLog(os.path.join(args.out, f"table_{i:02d}.jsonl"))
        for i in range(args.tables)
    ]
    # one game-state machine per table: the full detect.py lifecycle
    # (hero-card change -> new game id -> game_<id>.json) per fleet member
    trackers = [
        GameTracker(output_dir=os.path.join(args.out, f"table_{i:02d}"))
        for i in range(args.tables)
    ]
    ocr_engine = None
    if args.ocr:
        from manual_yolo_tpu.runtime.ocr import default_ocr_engine

        ocr_engine = default_ocr_engine()
    # overlapped warm-start (round 4): the terminal compiles each program
    # at its first execution, concurrently across programs — dispatch the
    # fixed detect/classify programs and every recognizer program NOW
    # (unfetched) so the whole compile wave runs while the fleet sources
    # initialise, instead of serially across the first ticks
    # (docs/BENCH_NOTES.md recorded a ~27-min degraded warmup episode)
    _prewarm = stream.prewarm_async()
    if ocr_engine is not None:
        # per-tick read counts vary with fleet churn; floor the bucket set
        # at 32 (one padded 32-lane call costs less than a lazy ~10-40 s
        # mid-tick compile) and warm the two buckets a 32-table fleet hits
        ocr_engine.MIN_BUCKET = 32
        _prewarm += ocr_engine.prewarm_async(
            buckets=(32, ocr_engine.MAX_CHUNK)
        )

    def gather_text_fields(frame, dets, ti, refs, crops, names):
        """Collect one table's OCR-eligible crops into the tick-wide
        batch (reference cascade fields, detect.py:580-600)."""
        from manual_yolo_tpu.game import taxonomy
        from manual_yolo_tpu.runtime.native import crop_u8

        for i, d in enumerate(dets):
            name = d["class_name"]
            if name in taxonomy.RANK_CLASSES or not (
                name.endswith(("_name", "_stack", "_bet"))
                or name in ("total_pot", "game_id", "iinput_field",
                            "my_stack", "my_bet")
            ):
                continue
            x1, y1, x2, y2 = d["bbox"]
            crop = crop_u8(frame, y1 - 2, x1 - 2, y2 + 2, x2 + 2)
            if crop.size == 0:
                continue
            refs.append((ti, i))
            crops.append(crop)
            names.append(name)

    def read_text_fields_fleet(results, c_frames, c_due):
        """ONE batched engine call per field kind per TICK: all changed
        tables' crops ride the same recognizer batch, so the tick pays a
        fixed number of device round trips regardless of how many tables
        changed (per-table calls made OCR the fleet's dominant cost)."""
        refs, crops, names = [], [], []
        for ti, dets in enumerate(results):
            if c_due is None or c_due[ti]:
                if c_frames is not None and c_frames[ti] is not None:
                    gather_text_fields(
                        c_frames[ti], dets, ti, refs, crops, names
                    )
        if refs:
            for (ti, di), text in zip(
                refs, ocr_engine.read_fields(crops, names)
            ):
                if text:
                    results[ti][di]["ocr_text"] = text

    import collections as coll

    # frames travel with their batch: collect order == submit order
    batch_meta = coll.deque()
    prev_frame_refs: List = [None] * args.tables

    timer = StageTimer()
    done_frames = 0
    t_start = time.perf_counter()
    last_report = t_start
    steady_t0 = None
    steady_frames0 = 0
    tick = 0
    try:
        while args.ticks == 0 or tick < args.ticks:
            with timer.stage("capture"):
                frames = [next(s) for s in sources]
            due = [f is not prev_frame_refs[i] for i, f in enumerate(frames)]
            prev_frame_refs = list(frames)
            batch_meta.append((frames, due))
            with timer.stage("submit"):
                stream.submit_batch(frames)
            if stream.in_flight > 2:
                with timer.stage("collect"):
                    results = stream.collect_batch()
                c_frames, c_due = batch_meta.popleft()
                # unchanged frame -> identical detections -> identical
                # state transition: skip the update (and its OCR); this
                # also protects text fields from being overwritten by
                # the empty reads of OCR-skipped ticks
                if ocr_engine is not None:
                    with timer.stage("ocr"):
                        read_text_fields_fleet(results, c_frames, c_due)
                for ti, dets in enumerate(results):
                    if c_due[ti]:
                        trackers[ti].update(dets)
                    logs[ti].append(json.dumps(
                        {"tick": tick, "detections": len(dets),
                         "fields": [d for d in dets if d["ocr_text"]]},
                        separators=(",", ":"),
                    ))
                done_frames += len(results)
                if args.save_every and tick % args.save_every == 0:
                    for tr in trackers:
                        tr.save()
            tick += 1
            if tick == args.warmup_ticks:
                steady_t0 = time.perf_counter()
                steady_frames0 = done_frames
            now = time.perf_counter()
            if now - last_report >= 1.0 and done_frames:
                fps = done_frames / (now - t_start)
                print(
                    f"[serve] tables={args.tables} ticks={tick} "
                    f"frames/s={fps:.1f} "
                    f"({fps / args.tables:.1f} ticks/s/table) "
                    f"modes={stream.mode_counts} memo={stream.memo_hits}",
                    file=sys.stderr,
                )
                last_report = now
        while stream.in_flight:
            results = stream.collect_batch()
            c_frames, c_due = (
                batch_meta.popleft() if batch_meta else (None, None)
            )
            if ocr_engine is not None:
                read_text_fields_fleet(results, c_frames, c_due)
            for ti, dets in enumerate(results):
                if c_due is None or c_due[ti]:
                    trackers[ti].update(dets)
                logs[ti].append(json.dumps(
                    {"tick": tick, "detections": len(dets),
                     "fields": [d for d in dets if d["ocr_text"]]},
                    separators=(",", ":"),
                ))
                done_frames += 1
    except KeyboardInterrupt:
        pass
    finally:
        # graceful shutdown: persist every table's in-flight game
        # (reference detect.py:702-706 semantics, fleet-wide)
        for tr in trackers:
            tr.save()
        for lg in logs:
            lg.close()
        stream.close()
    wall = time.perf_counter() - t_start
    summary = {
        "tables": args.tables, "ticks": tick,
        "frames": done_frames, "wall_s": round(wall, 2),
        "frames_per_s": round(done_frames / max(wall, 1e-9), 2),
        "modes": stream.mode_counts, "memo_hits": stream.memo_hits,
    }
    if steady_t0 is not None and done_frames > steady_frames0:
        sw = time.perf_counter() - steady_t0
        summary["steady_frames_per_s"] = round(
            (done_frames - steady_frames0) / max(sw, 1e-9), 2
        )
    print(json.dumps(summary))
    if args.stats:
        print(timer.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Streaming engine: pipelining semantics + equivalence with the fused path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.game import taxonomy  # noqa: E402
from manual_yolo_tpu.models import yolov8  # noqa: E402
from manual_yolo_tpu.runtime.serving import StreamingEngine  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    return StreamingEngine(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES,
        rank_names={i: str(i) for i in range(13)},
        imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
        use_pallas_nms=False, detect_depth=1, classify_depth=0,
    )


def test_pipeline_depth_and_order(engine):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (240, 400, 3), np.uint8) for _ in range(4)]
    results = []
    for f in frames:
        r = engine.process(f)
        if r is not None:
            results.append(r)
    results.extend(engine.drain())
    # all submitted frames come back, in order, despite 2-deep pipelining
    assert len(results) == 4
    for dets in results:
        for d in dets:
            x1, y1, x2, y2 = d["bbox"]
            assert 0 <= x1 <= x2 <= 400 and 0 <= y1 <= y2 <= 240


def test_first_poll_is_none_until_full(engine):
    rng = np.random.default_rng(1)
    f = rng.integers(0, 255, (240, 400, 3), np.uint8)
    engine.drain()
    assert engine.process(f) is None  # pipeline not yet full
    out = engine.process(f)
    assert out is not None
    engine.drain()


def test_detection_fields(engine):
    rng = np.random.default_rng(2)
    f = rng.integers(0, 255, (240, 400, 3), np.uint8)
    engine.drain()
    engine.submit(f)
    dets = engine.drain()[0]
    for d in dets:
        assert set(d) >= {"class_id", "class_name", "bbox", "conf", "ocr_text"}


def test_batch_stream_roundtrip():
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    s = BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
        batch=4, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
        use_pallas_nms=False,
    )
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (240, 400, 3), np.uint8) for _ in range(4)]
    s.submit_batch(frames)
    assert s.in_flight == 1
    results = s.collect_batch()
    assert len(results) == 4 and s.in_flight == 0
    for dets in results:
        for d in dets:
            x1, y1, x2, y2 = d["bbox"]
            assert 0 <= x1 <= x2 <= 400 and 0 <= y1 <= y2 <= 240
            assert set(d) >= {"class_id", "class_name", "conf", "ocr_text"}


def test_host_and_device_letterbox_agree(engine):
    """StreamingEngine's host cv2 letterbox must match the fused path's
    on-device jax.image letterbox (same geometry, near-identical pixels)."""
    from manual_yolo_tpu.ops.letterbox import letterbox

    rng = np.random.default_rng(7)
    frame = rng.integers(0, 255, (240, 400, 3), np.uint8)
    host_canvas, r_h, pad_h = engine._letterbox_host(frame)  # BGR canvas
    dev_canvas, r_d, pad_d = letterbox(jnp.asarray(frame), (192, 192))
    assert r_h == r_d and pad_h == pad_d
    dev_u8 = np.asarray(dev_canvas * 255.0)
    diff = np.abs(host_canvas.astype(np.float32) - dev_u8)
    # interpolation implementations differ by at most ~1 gray level
    assert np.percentile(diff, 99) <= 2.0
    assert diff.mean() < 1.0


def test_batch_stream_delta_matches_raw():
    """Tri-mode delta canvas streaming must be LOSSLESS: identical
    detections to raw mode across a stream that exercises ALL THREE modes
    (first-batch raw, nibble-sized jitter, an identical repeat -> skip,
    and a large local repaint -> raw fallback)."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )

    def build(delta):
        return BatchStream(
            det_params=det_params, det_spec=det_spec,
            cls_params=cls_params, cls_spec=cls_spec,
            names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
            batch=2, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
            use_pallas_nms=False, delta=delta,
        )

    rng = np.random.default_rng(1)
    # mid-range base: jitter never clips, so whole segments shift by one
    # constant -> the per-segment encoder sees const segments (the real
    # screenshot case); a full-range base would clip in every segment and
    # the byte comparison would legitimately pick dense tribit instead
    base = rng.integers(20, 236, (240, 400, 3), np.uint8)
    batches = []
    for _ in range(3):  # nearly-static stream: small jitter per batch
        jit = rng.integers(-4, 5, (1, 1, 3), np.int16)
        f = np.clip(base.astype(np.int16) + jit, 0, 255).astype(np.uint8)
        batches.append([f, f.copy()])
    batches.append([b.copy() for b in batches[-1]])  # identical -> skip
    repaint = batches[-1][0].copy()
    repaint[40:120, 100:220] = 255 - repaint[40:120, 100:220]  # card flip
    batches.append([repaint, batches[-1][1].copy()])  # big delta -> raw

    s_raw, s_delta = build(False), build(True)
    for b in batches:
        s_raw.submit_batch(b)
        s_delta.submit_batch(b)
        r1 = s_raw.collect_batch()
        r2 = s_delta.collect_batch()
        assert r1 == r2
        assert any(len(d) for d in r1)  # stream actually detected something
    # the stream above must have exercised the delta encoder end to end:
    # small constant jitter lands in the per-segment mode (mostly const
    # segments), the repeat in skip, the single-slot repaint in the
    # per-slot mode, the first batch in raw
    assert s_delta.mode_counts["raw"] >= 1  # first batch
    assert s_delta.mode_counts["slots"] == 1  # the one-slot repaint
    assert s_delta.mode_counts["segs"] >= 2
    assert s_delta.mode_counts["skip"] == 1
    assert s_raw.mode_counts == {
        "raw": 5, "nibble": 0, "tribit": 0, "slots": 0, "segs": 0,
        "skip": 0,
    }


def test_batch_stream_letterbox_geometry_change_clears_padding():
    """If a slot's frame geometry changes, stale pixels from the previous
    geometry must not survive in the new padding region (the detector would
    see ghost content)."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=4)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    s = BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names={i: f"c{i}" for i in range(4)}, rank_names={},
        batch=1, imgsz=128, compute_dtype=jnp.float32, use_pallas_nms=False,
    )
    wide = np.full((64, 256, 3), 250, np.uint8)   # content rows 48..79
    tall = np.full((256, 64, 3), 250, np.uint8)   # content cols 48..79
    dst = s._staging[0][0]
    s._letterbox_into(dst, wide, key=(0, 0))
    assert dst[0, 0, 0] == 114 and dst[64, 64, 0] == 250
    s._letterbox_into(dst, tall, key=(0, 0))
    # (64, 10) was wide-content, is tall-padding: stale 250 must be gone
    assert dst[64, 10, 0] == 114 and dst[0, 10, 0] == 114
    assert dst[64, 64, 0] == 250


def test_batch_stream_memoized_static_tail_matches_fresh():
    """A skip-mode batch whose raw frames are all byte-identical to the
    previous batch must return results EQUAL to a fresh computation (the
    worker memoizes the tail), and mutating collected results must not
    corrupt the memo."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    s = BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
        batch=2, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
        use_pallas_nms=False,
    )
    rng = np.random.default_rng(3)
    f = rng.integers(0, 255, (240, 400, 3), np.uint8)
    batch = [f, f.copy()]
    s.submit_batch(batch)
    first = s.collect_batch()
    s.submit_batch([b.copy() for b in batch])  # identical content, new arrays
    second = s.collect_batch()
    assert s.memo_hits == 1
    assert second == first
    # caller mutation must not leak into the memo
    if second[0]:
        second[0][0]["ocr_text"] = "MUTATED"
    s.submit_batch([b.copy() for b in batch])
    third = s.collect_batch()
    assert s.memo_hits == 2
    assert third == first


def test_batch_stream_active_rows_upload_lossless():
    """Uniform-geometry batches must route through the active-rows
    programs (content rows only; 114 bars padded on device) with results
    equal to full-canvas raw mode — including across a geometry CHANGE,
    where the nibble-active gate must fall back (the resident canvas's
    padding is unknown at the new geometry)."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )

    def build(delta):
        return BatchStream(
            det_params=det_params, det_spec=det_spec,
            cls_params=cls_params, cls_spec=cls_spec,
            names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
            batch=2, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
            use_pallas_nms=False, delta=delta,
        )

    rng = np.random.default_rng(3)
    wide = rng.integers(0, 255, (240, 400, 3), np.uint8)    # geometry A
    wide2 = np.clip(wide.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    # per-pixel +-5 noise: slot-channel span <= 10 fits the nibble mode but
    # busts the tribit mode's per-row span-7 limit
    wide3 = np.clip(
        wide.astype(np.int16) + rng.integers(-5, 6, wide.shape, np.int16),
        0, 255,
    ).astype(np.uint8)
    tall = rng.integers(0, 255, (400, 240, 3), np.uint8)    # geometry B (nw<imgsz)
    batches = [[wide, wide.copy()], [wide2, wide2.copy()],
               [wide3, wide3.copy()],
               [tall, tall.copy()], [wide, wide.copy()],
               [wide2, wide2.copy()]]

    s_raw, s_delta = build(False), build(True)
    for b in batches:
        s_raw.submit_batch(b)
        s_delta.submit_batch(b)
        assert s_raw.collect_batch() == s_delta.collect_batch()
    # geometry A is full-width -> active programs were built and used
    r, nh, nw, top, left = __import__(
        "manual_yolo_tpu.ops.letterbox", fromlist=["letterbox_params"]
    ).letterbox_params((240, 400), (192, 192))
    assert (top, nh) in s_delta._active_progs
    # A->A constant jitter -> segs (mostly const segments); A->A per-pixel
    # noise -> segment spans ~10 bust both segs' 3-bit ceiling and tribit,
    # landing in nibble; B->A geometry switch must NOT use a delta mode
    # (prev_geom gate)
    assert s_delta.mode_counts["segs"] >= 1
    assert s_delta.mode_counts["nibble"] >= 1
    assert s_delta.mode_counts["raw"] >= 3  # first, tall, and B->A switch


def test_seg_encode_native_matches_numpy():
    """The native seg_encode and its numpy mirror must agree byte-for-byte
    (payloads, biases, classes, counts) on a stream mixing all five
    segment classes."""
    from manual_yolo_tpu.runtime import native as native_mod

    if native_mod.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    B, H, W, segw = 4, 64, 64, 8
    top, nh = 8, 48
    prev = rng.integers(0, 256, (B, H, W, 3), np.uint8)
    cur = prev.copy()
    act = slice(top, top + nh)
    # slot 0: +3 constant shift (const segs unclipped; clipped segments are
    # byte-exact clamp(prev+3) -> class 5); slot 1: tiny per-pixel noise
    # (2/3-bit); slot 2: repaint (raw); slot 3: random 0/1 per-pixel
    # increments (span 1, NOT a uniform shift -> 1-bit class)
    cur[0, act] = np.clip(cur[0, act].astype(np.int16) + 3, 0, 255).astype(np.uint8)
    cur[1, act] = np.clip(
        cur[1, act].astype(np.int16) + rng.integers(-2, 3, (nh, W, 3)), 0, 255
    ).astype(np.uint8)
    cur[2, top + 10 : top + 30, 10:40] = rng.integers(0, 256, (20, 30, 3), np.uint8)
    inc = rng.integers(0, 2, (nh, W, 3)).astype(np.int16)
    cur[3, act] = np.clip(
        cur[3, act].astype(np.int16) + inc, 0, 255
    ).astype(np.uint8)

    nseg = B * nh * (W // segw)
    segb = segw * 3
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb

    def run(force_numpy):
        bufs = (
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q2, np.uint8),
            np.zeros(nseg * q3, np.uint8), np.zeros(nseg * qr, np.uint8),
            np.zeros(nseg, np.uint8), np.zeros(nseg, np.uint8),
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q1, np.uint8),
            np.zeros(nseg * segb, np.uint8), np.zeros(nseg * segb, np.uint8),
            np.zeros(nseg * 3, np.uint8), np.zeros(nseg, np.uint8),
        )
        counts = native_mod.seg_encode(
            cur, prev, top, nh, segw, *bufs, force_numpy=force_numpy
        )
        return counts, bufs

    cn, bn = run(False)
    cp, bp = run(True)
    assert cn == cp and cn is not None
    k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4t, d8t = cn
    # all dense payload classes + the repaint's fully-random 8-px
    # segments split between sparse-byte (nz <= 20: two-level mask cost
    # 1 + 3 + nz beats raw's 24) and raw (nz = 21, i.e. every channel's
    # modal delta is unique — the common case for pure noise)
    assert k1 > 0 and k2 > 0 and k3 > 0 and k10m > 0 and nz8 > 0
    assert kr > 0
    cls_hist = np.bincount(bn[11], minlength=6)
    assert cls_hist[0] > 0  # const segments too
    assert cls_hist[5] > 0  # clamp-shift segments (clipped +3 shift)
    for a, b in zip(bn, bp):
        assert np.array_equal(a, b)


def test_batch_stream_segs_mode_lossless_mixed_stream():
    """The per-segment mode must produce detections identical to raw mode
    on a MIXED stream — global photometric jitter plus localized repaints
    in most slots — that defeats both the per-slot mode (too many changed
    slots) and whole-batch tribit/nibble span tests."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )

    def build(delta):
        return BatchStream(
            det_params=det_params, det_spec=det_spec,
            cls_params=cls_params, cls_spec=cls_spec,
            names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
            batch=8, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
            use_pallas_nms=False, delta=delta,
        )

    rng = np.random.default_rng(5)
    # mid-range base: photometric jitter never clips, so the letterboxed
    # delta stays (near-)uniform per slot — the smooth-content regime real
    # table frames live in. (Full-range noise after resize interpolation
    # pushes the segs payload right at the tribit threshold, where either
    # mode is a legitimate choice.)
    base = rng.integers(30, 226, (240, 400, 3), np.uint8)

    def jittered():
        j = rng.integers(-4, 5, (1, 1, 3), np.int16)
        return np.clip(base.astype(np.int16) + j, 0, 255).astype(np.uint8)

    batches = [[jittered() for _ in range(8)] for _ in range(3)]
    mixed = [f.copy() for f in batches[-1]]
    for i in range(6):  # 6 of 8 slots repainted: slots mode can't engage
        mixed[i][40:80, 100 + 10 * i : 180 + 10 * i] = (
            255 - mixed[i][40:80, 100 + 10 * i : 180 + 10 * i]
        )
    batches.append(mixed)

    s_raw, s_delta = build(False), build(True)
    for b in batches:
        s_raw.submit_batch(b)
        s_delta.submit_batch(b)
        r1 = s_raw.collect_batch()
        r2 = s_delta.collect_batch()
        assert r1 == r2
        assert any(len(d) for d in r1)
    # jitter-only batches AND the mixed batch all land in segs — the mixed
    # one required raw-class segments for the repaints, same program
    assert s_delta.mode_counts["segs"] >= 3
    assert s_delta.mode_counts["raw"] == 1  # first batch only
    # the classifier-crop plane streamed through the delta ladder (on this
    # unstable-box noise content it legitimately lands in raw; the segs and
    # skip rungs are covered by test_classify_crop_segs_program_bit_exact)
    assert sum(s_delta.crop_mode_counts.values()) >= 1
    s_raw.close()
    s_delta.close()


def test_segs_payload_roundtrip_decoder():
    """encode (native) -> assemble (host, packed-bias trailer) -> decode
    (device program) must reproduce the current plane bit-exactly,
    including letterbox padding rows and every payload class. Exercises
    the compressed bias path with wrapped (negative) biases and
    per-slot defaults that differ between slots."""
    from manual_yolo_tpu.runtime import native as native_mod
    from manual_yolo_tpu.runtime.serving import BatchStream, _segs_decoder

    rng = np.random.default_rng(3)
    nslots, H, W, segw = 4, 64, 64, 8
    top, nh = 8, 48
    prev = rng.integers(0, 256, (nslots, H, W, 3), np.uint8)
    cur = prev.copy()
    act = slice(top, top + nh)
    shifts = (3, -2, 1, 0)  # per-slot photometric shift (slot defaults)
    for s, k in enumerate(shifts):
        cur[s, act] = np.clip(
            cur[s, act].astype(np.int16) + k, 0, 255
        ).astype(np.uint8)
    cur[2, top + 4 : top + 12, 8:32] = rng.integers(0, 256, (8, 24, 3), np.uint8)

    nseg = nslots * nh * (W // segw)
    segb = segw * 3
    qs = (segb // 8, segb // 4, segb * 3 // 8, segb)
    raw_act = nslots * nh * W * 3
    bufs = BatchStream._make_segs_bufs(segw, nseg, raw_act, 1)
    counts = native_mod.seg_encode(
        cur, prev, top, nh, segw, bufs["p1"], bufs["p2"], bufs["p3"],
        bufs["raw"], bufs["m4"], bufs["m8"], bufs["s4"], bufs["s8"],
        bufs["nib"], bufs["byte"], bufs["bias"], bufs["cls"],
    )
    assert counts is not None
    enc = BatchStream._assemble_segs_payload(
        bufs, 0, counts, qs, nseg, nslots, raw_act
    )
    assert enc is not None
    payload, npb = enc
    assert len(payload) < raw_act // 2
    decode = _segs_decoder(nslots, H, W, top, nh, segw, npb)
    out = np.asarray(
        jax.jit(decode)(jnp.asarray(payload), jnp.asarray(prev.reshape(-1)))
    ).reshape(nslots, H, W, 3)
    expect = cur.copy()
    expect[:, :top] = 114
    expect[:, top + nh :] = 114
    assert np.array_equal(out, expect)


def test_classify_crop_segs_program_bit_exact():
    """The crop-plane segs program must hand the classifier a BIT-EXACT
    reconstruction of the crops (decoded plane == host crops) and produce
    the same probabilities as a raw upload."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )
    s = BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=cls_params, cls_spec=cls_spec,
        names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
        batch=2, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
        use_pallas_nms=False,
    )
    rng = np.random.default_rng(9)
    ns = s.B * s.max_rank
    prev = rng.integers(30, 220, (ns, 64, 64, 3), np.uint8)
    cur = prev.copy()
    cur[:4] = np.clip(cur[:4].astype(np.int16) + 3, 0, 255).astype(np.uint8)
    cur[4] = rng.integers(0, 256, (64, 64, 3), np.uint8)  # raw rows
    cur[5, 10:20] = np.clip(
        cur[5, 10:20].astype(np.int16) + rng.integers(-2, 3, (10, 64, 3)),
        0, 255,
    ).astype(np.uint8)

    s._prev_crops = prev
    s._dev_prev_crops = jnp.asarray(prev.reshape(-1))
    enc = s._encode_crop_segs(cur)
    assert enc is not None
    payload, npb = enc
    assert len(payload) < cur.nbytes // 2
    probs_d, dev_crops = s._get_classify_segs_prog(npb)(
        s.cls_params, jnp.asarray(payload), s._dev_prev_crops
    )
    assert np.array_equal(
        np.asarray(dev_crops).reshape(cur.shape), cur
    )  # lossless reconstruction
    probs_raw = s._classify(s.cls_params, jnp.asarray(cur.reshape(-1)))
    assert np.array_equal(np.asarray(probs_d), np.asarray(probs_raw))

    # the _classify_crops mode ladder: raw (no reference) -> segs (const
    # shift) -> skip (identical crops), probabilities equal throughout
    s._prev_crops = None
    s._dev_prev_crops = None
    p0 = np.asarray(s._classify_crops(prev))
    shifted = np.clip(prev.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    p1 = np.asarray(s._classify_crops(shifted))
    p2 = np.asarray(s._classify_crops(shifted.copy()))
    assert s.crop_mode_counts["raw"] >= 1
    assert s.crop_mode_counts["segs"] >= 1
    assert s.crop_mode_counts["skip"] >= 1
    assert np.array_equal(
        p1, np.asarray(s._classify(s.cls_params, jnp.asarray(shifted.reshape(-1))))
    )
    assert np.array_equal(p1, p2)
    # non-staleness: the segs step advanced the device-resident reference
    # to the SHIFTED crops (u8 wire probabilities may quantize equal for a
    # +2 photometric shift, so compare the classifier INPUT, not outputs)
    assert np.array_equal(
        np.asarray(s._dev_prev_crops).reshape(shifted.shape), shifted
    )
    assert p0 is not p1
    s.close()


def test_serve_cli_fleet_end_to_end(tmp_path):
    """cli/serve.py: N table streams -> per-table JSONL + game_<id>.json,
    delta modes engaged, trackers fed only on changed ticks."""
    import json as json_mod
    import os

    if not os.path.exists("weights/poker_detector_n.npz"):
        pytest.skip("trained weights not present")
    from manual_yolo_tpu.cli import serve

    out = str(tmp_path / "fleet")
    rc = serve.main([
        "--tables", "2", "--ticks", "8", "--imgsz", "192",
        "--width", "480", "--height", "300",
        "--detector", "weights/poker_detector_n.npz",
        "--classifier", "weights/rank_classifier_matched.npz",
        "--out", out, "--save-every", "4", "--warmup-ticks", "2",
    ])
    assert rc == 0
    for ti in range(2):
        jsonl = os.path.join(out, f"table_{ti:02d}.jsonl")
        assert os.path.exists(jsonl)
        rows = [json_mod.loads(l) for l in open(jsonl)]
        assert len(rows) == 8 and all("detections" in r for r in rows)
        games = [
            f for f in os.listdir(os.path.join(out, f"table_{ti:02d}"))
            if f.startswith("game_")
        ]
        assert games, "game-state files must be persisted"
        g = json_mod.load(
            open(os.path.join(out, f"table_{ti:02d}", sorted(games)[-1]))
        )
        assert {"hero", "board", "villains", "game_state"} <= set(g)


def test_stable_rect_hysteresis():
    """Crop-rect hysteresis: rects within the pad tolerance of a cached one
    reuse the cached rect verbatim (stable crop bytes under detector box
    jitter); rects beyond it, or for other classes, get their own entry."""
    import types

    from manual_yolo_tpu.runtime.serving import BatchStream

    stub = types.SimpleNamespace(_rect_cache={}, crop_pad=6)
    sr = BatchStream._stable_rect
    base = (100, 200, 160, 260)
    assert sr(stub, 5, base) == base
    # all coords jittered within +-6 -> the cached rect comes back
    assert sr(stub, 5, (104, 196, 166, 258)) == base
    assert sr(stub, 5, (94, 206, 154, 266)) == base
    # one edge beyond the tolerance -> a new entry
    far = (100, 200, 160, 267)
    assert sr(stub, 5, far) == far
    # both entries persist; nearest-match picks the right one
    assert sr(stub, 5, (99, 201, 161, 259)) == base
    # a different class never shares entries
    other = (101, 201, 161, 261)
    assert sr(stub, 9, other) == other
    # cache is bounded per class
    for k in range(20):
        sr(stub, 5, (1000 * k, 0, 1000 * k + 50, 50))
    assert len(stub._rect_cache[5]) <= 8


def test_batch_stream_fused_predictive_classify_lossless():
    """The fused predictive-classify path (crops gathered at predicted
    rects, shipped with the canvas payload, detect+classify as one
    program) must produce results identical to a raw-mode stream fed the
    same frames — including rank texts resolved through the miss-fallback
    for detections whose rect prediction fails."""
    from manual_yolo_tpu.runtime.serving import BatchStream

    det_spec = yolov8.build_spec("detect", "n", nc=64)
    cls_spec = yolov8.build_spec("classify", "n", nc=13)
    det_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(0), det_spec), det_spec
    )
    cls_params = yolov8.fold_params(
        yolov8.init_params(jax.random.PRNGKey(1), cls_spec), cls_spec
    )

    def mk(**kw):
        return BatchStream(
            det_params=det_params, det_spec=det_spec,
            cls_params=cls_params, cls_spec=cls_spec,
            names=taxonomy.CLASSES, rank_names={i: str(i) for i in range(13)},
            batch=4, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
            use_pallas_nms=False, **kw,
        )

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (240, 400, 3), np.uint8)

    def frame(t, i):
        f = np.clip(
            base.astype(np.int16) + (t + i) % 5 - 2, 0, 255
        ).astype(np.uint8)
        y = 20 * ((t * 7 + i * 3) % 9)
        f[y : y + 30, 50:90] = rng.integers(0, 256, (30, 40, 3), np.uint8)
        return f

    sd, sr = mk(), mk(delta=False)
    try:
        for t in range(5):
            fr = [frame(t, i) for i in range(4)]
            sd.submit_batch(fr)
            sr.submit_batch(fr)
            assert sd.collect_batch() == sr.collect_batch()
        n_fused = (
            sd.crop_mode_counts["fused_segs"] + sd.crop_mode_counts["fused_raw"]
        )
        assert n_fused >= 3, f"fused path never engaged: {sd.crop_mode_counts}"
        assert sd.fused_hits > 0
    finally:
        sd.close()
        sr.close()


def test_seg_encode_whole_slot_clamp_shift_fast_path():
    """A slot that is exactly clamp(prev + j) everywhere (pure photometric
    tick) must classify EVERY segment class 5 with bias j — the native
    fast path and the numpy mirror must agree byte-for-byte, including on
    span-0 segments (class 5, not 0, inside such a slot)."""
    from manual_yolo_tpu.runtime import native as native_mod

    rng = np.random.default_rng(7)
    B, H, W, segw = 2, 32, 64, 8
    top, nh = 0, 32
    prev = rng.integers(0, 256, (B, H, W, 3), np.uint8)
    prev[0, :4] = 255  # saturated region -> clipped under the shift
    cur = prev.copy()
    cur[0] = np.clip(prev[0].astype(np.int16) + np.array([3, -5, 2]), 0, 255).astype(np.uint8)
    cur[1, 10:20, 10:30] = rng.integers(0, 256, (10, 20, 3), np.uint8)

    nseg = B * nh * (W // segw)
    segb = segw * 3
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb

    def run(force_numpy):
        bufs = (
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q2, np.uint8),
            np.zeros(nseg * q3, np.uint8), np.zeros(nseg * qr, np.uint8),
            np.zeros(nseg, np.uint8), np.zeros(nseg, np.uint8),
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q1, np.uint8),
            np.zeros(nseg * segb, np.uint8), np.zeros(nseg * segb, np.uint8),
            np.zeros(nseg * 3, np.uint8), np.zeros(nseg, np.uint8),
        )
        counts = native_mod.seg_encode(
            cur, prev, top, nh, segw, *bufs, force_numpy=force_numpy
        )
        return counts, bufs

    cn, bn = run(False)
    cp, bp = run(True)
    if native_mod.get_lib() is not None:
        assert cn == cp
        for a, b in zip(bn, bp):
            np.testing.assert_array_equal(a, b)
    sps = nh * (W // segw)
    assert (bn[11][:sps] == 5).all()  # slot 0: every segment clamp-shift
    exp = np.array([3, 256 - 5, 2], np.uint8)
    np.testing.assert_array_equal(
        bn[10][: sps * 3].reshape(-1, 3), np.broadcast_to(exp, (sps, 3))
    )
    assert (bn[11][sps : 2 * sps] != 5).any()  # slot 1 repainted -> mixed


def _tiny_stream(batch=2, delta=True, **kw):
    from manual_yolo_tpu.runtime.serving import BatchStream

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
        batch=batch, imgsz=192, conf=1e-6, compute_dtype=jnp.float32,
        use_pallas_nms=False, delta=delta, **kw,
    )


def test_readback_bound_overflow_matches_packed():
    """The count-bounded u8 readback and the full-plane overflow fallback
    must yield the same detections: stream A's bound is below the actual
    count (every batch falls back to the resident f16 plane), stream B's
    bound covers it (pure packed u16/u8 path). Classes, counts and rank
    texts match exactly; boxes within the 1/16-px fixed-point vs f16
    rounding; confidences within the u16 quantization step."""
    s_lo = _tiny_stream(max_det=8, readback_det=4)
    s_hi = _tiny_stream(max_det=8, readback_det=8)
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (240, 400, 3), np.uint8) for _ in range(2)]
    try:
        for s in (s_lo, s_hi):
            s.submit_batch(frames)
        out_lo = s_lo.collect_batch()
        out_hi = s_hi.collect_batch()
        assert s_lo.readback_overflows >= 1
        assert s_hi.readback_overflows == 0
        assert len(out_lo) == len(out_hi)
        n_dets = 0
        for dl, dh in zip(out_lo, out_hi):
            assert len(dl) == len(dh)
            n_dets += len(dl)
            for a, b in zip(dl, dh):
                assert a["class_id"] == b["class_id"]
                assert a["ocr_text"] == b["ocr_text"]
                assert abs(a["conf"] - b["conf"]) <= 0.002
                assert all(
                    abs(x - y) <= 1 for x, y in zip(a["bbox"], b["bbox"])
                )
        assert n_dets > 0  # conf=1e-6 random weights always detect
    finally:
        s_lo.close()
        s_hi.close()


def test_batch_stream_recovers_after_dispatch_failure():
    """A batch that fails in the dispatcher (after the submit thread already
    advanced the host delta references) must not poison the delta chain:
    the next submit re-establishes it RAW and its results match a fresh
    stream's."""
    s = _tiny_stream()
    ref = _tiny_stream()
    rng = np.random.default_rng(2)
    frames1 = [rng.integers(0, 255, (240, 400, 3), np.uint8) for _ in range(2)]
    frames2 = [
        np.clip(f.astype(np.int16) + 3, 0, 255).astype(np.uint8)
        for f in frames1
    ]
    s.submit_batch(frames1)
    s.collect_batch()
    # inject a dispatch failure for the next batch only: the uniform +3
    # shift rides the segs/fused path, whose program is handed to the
    # DISPATCHER thread — a raising program fails the batch exactly where
    # a real device error would
    real_fused = s._get_fused_prog
    real_progs = s._get_active_progs

    def boom(*a, **k):
        raise RuntimeError("injected dispatch failure")

    s._get_fused_prog = lambda *a, **k: boom
    s._get_active_progs = lambda *a, **k: {
        "raw": boom, "nibble": boom, "tribit": boom
    }
    s.submit_batch(frames2)
    with pytest.raises(Exception):
        s.collect_batch()
    s._get_fused_prog = real_fused
    s._get_active_progs = real_progs
    assert s._delta_broken
    # next batch: chain re-established raw, results correct
    raw_before = s.mode_counts["raw"]
    s.submit_batch(frames2)
    got = s.collect_batch()
    assert s.mode_counts["raw"] == raw_before + 1
    ref.submit_batch(frames1)
    ref.collect_batch()
    ref.submit_batch(frames2)
    want = ref.collect_batch()
    for g_dets, w_dets in zip(got, want):
        assert len(g_dets) == len(w_dets)
        for g, w in zip(g_dets, w_dets):
            assert g["bbox"] == w["bbox"] and g["class_id"] == w["class_id"]
    s.close()
    ref.close()


def test_batch_stream_close_with_inflight_batch_does_not_hang():
    """close() while a batch is still queued must terminate all three
    pipeline threads (the shutdown sentinel is forwarded through the
    chain, never overtaking an in-flight batch)."""
    s = _tiny_stream()
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (240, 400, 3), np.uint8) for _ in range(2)]
    s.submit_batch(frames)  # not collected
    s.close()
    assert not s._dispatch_thread.is_alive()
    assert not s._worker_thread.is_alive()
    assert not s._applier_thread.is_alive()


def test_seg_encode_sparse_exception_classes_roundtrip():
    """Round-5 sparse classes 8/9/10 (deviation mask + nibble/byte
    exception streams): native == numpy byte-for-byte, the classes engage
    on sparse-residual segments where they are byte-cheapest, raw still
    wins on dense repaints at wide segments, and the device decode is
    bit-exact through the full assemble path."""
    from manual_yolo_tpu.runtime import native as native_mod
    from manual_yolo_tpu.runtime.serving import BatchStream, _segs_decoder

    rng = np.random.default_rng(13)
    nslots, H, W, segw = 2, 48, 80, 40  # 40-px segments like the canvas
    top, nh = 4, 40
    segb = segw * 3
    prev = rng.integers(30, 220, (nslots, H, W, 3), np.uint8)
    cur = prev.copy()
    act = slice(top, top + nh)
    # slot 0 rows 0..7: uniform +5 shift (the slot's jj candidate comes
    # from here); rows 8..15: uniform -3 shift + FEW scattered small
    # deviations — the shift base (j=+5) misses every byte there while
    # the const-modal base (-3) leaves only the scattered deviants, so
    # the sparse nibble CONST class (8) is the byte-cheapest
    cur[0, top : top + 8] = np.clip(
        cur[0, top : top + 8].astype(np.int16) + 5, 0, 255
    ).astype(np.uint8)
    cur[0, top + 8 : top + 16] = np.clip(
        cur[0, top + 8 : top + 16].astype(np.int16) - 3, 0, 255
    ).astype(np.uint8)
    for r in range(8, 16):
        row = top + r
        idx = rng.choice(W * 3, size=10, replace=False)
        flat = cur[0, row].reshape(-1)
        flat[idx] = (flat[idx].astype(np.int16) + int(rng.integers(2, 8))).clip(0, 255).astype(np.uint8)
    # slot 1: global +9 shift with a saturated stripe -> clamp-shift holds
    # except near the stripe where prev was clipped: sparse nibble over
    # the SHIFT base (class 9) or one-sided 6/7, whichever is cheaper
    prev[1, act] = np.clip(prev[1, act].astype(np.int16), 30, 220).astype(np.uint8)
    prev[1, top + 20 : top + 24] = 252  # clipped under the shift
    content = prev[1].astype(np.int16).copy()
    content[top + 20 : top + 24] = 255 - rng.integers(0, 6, (4, W, 3))
    cur[1] = np.clip(content + 9, 0, 255).astype(np.uint8)
    # slot 0 rows 24..31: dense random repaint -> raw must still win at
    # 40-px segments (nz > segb - q1)
    cur[0, top + 24 : top + 32] = rng.integers(0, 256, (8, W, 3), np.uint8)
    # slot 0 rows 32..: one big sparse byte-exception region: mostly
    # unchanged segment with ~30 arbitrary-value bytes (class 10: 15 + 30
    # beats raw's 120 and nothing denser fits)
    for r in range(32, 38):
        row = top + r
        idx = rng.choice(W * 3, size=30, replace=False)
        flat = cur[0, row].reshape(-1)
        flat[idx] = rng.integers(0, 256, 30).astype(np.uint8)

    nseg = nslots * nh * (W // segw)
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb

    def run(force_numpy):
        bufs = (
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q2, np.uint8),
            np.zeros(nseg * q3, np.uint8), np.zeros(nseg * qr, np.uint8),
            np.zeros(nseg, np.uint8), np.zeros(nseg, np.uint8),
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q1, np.uint8),
            np.zeros(nseg * segb, np.uint8), np.zeros(nseg * segb, np.uint8),
            np.zeros(nseg * 3, np.uint8), np.zeros(nseg, np.uint8),
        )
        counts = native_mod.seg_encode(
            cur, prev, top, nh, segw, *bufs, force_numpy=force_numpy
        )
        return counts, bufs

    cn, bn = run(False)
    cp, bp = run(True)
    if native_mod.get_lib() is not None:
        assert cn == cp
        for a, b in zip(bn, bp):
            np.testing.assert_array_equal(a, b)
    k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4t, d8t = cp
    hist = np.bincount(bp[11], minlength=11)
    assert hist[8] > 0, f"sparse-nibble const class never engaged: {hist}"
    assert hist[10] > 0 and nz8 > 0, f"sparse-byte class never engaged: {hist}"
    assert kr > 0, f"dense repaint must stay raw at 40px segments: {hist}"
    assert k4m == hist[8] + hist[9] and k10m == hist[10]

    # device decode bit-exactness through the full assemble path
    sbufs = BatchStream._make_segs_bufs(segw, nseg, nslots * nh * W * 3, 1)
    counts = native_mod.seg_encode(
        cur, prev, top, nh, segw, sbufs["p1"], sbufs["p2"], sbufs["p3"],
        sbufs["raw"], sbufs["m4"], sbufs["m8"], sbufs["s4"],
        sbufs["s8"], sbufs["nib"], sbufs["byte"], sbufs["bias"],
        sbufs["cls"],
    )
    enc = BatchStream._assemble_segs_payload(
        sbufs, 0, counts, (q1, q2, q3, qr), nseg, nslots,
        nslots * nh * W * 3,
    )
    assert enc is not None
    payload, npb = enc
    decode = _segs_decoder(nslots, H, W, top, nh, segw, npb)
    out = np.asarray(
        jax.jit(decode)(jnp.asarray(payload), jnp.asarray(prev.reshape(-1)))
    ).reshape(nslots, H, W, 3)
    expect = cur.copy()
    expect[:, :top] = 114
    expect[:, top + nh :] = 114
    assert np.array_equal(out, expect)


def test_seg_encode_shift_residual_classes_clip_boundary():
    """Classes 6/7 (clamp-shift + one-sided residual): brightening jitter
    over content with antialiased saturating highlights. Unclipped pixels
    shift by j (delta = j, large) while near-saturated pixels land at
    255 + e (delta small) — a within-segment delta span far beyond class
    3's 7, with a tiny ONE-SIDED residual vs the clamp-shift prediction.
    Before round 4 those segments fell to raw (120 B vs 30/45 B). Checks
    native == numpy byte-for-byte, that the new classes actually engage,
    that raw stays confined to true repaints, and that the device decode
    is bit-exact."""
    from manual_yolo_tpu.runtime import native as native_mod
    from manual_yolo_tpu.runtime.serving import BatchStream, _segs_decoder

    rng = np.random.default_rng(11)
    nslots, H, W, segw = 2, 64, 64, 8
    top, nh = 8, 48
    j = 20  # per-frame brightening jitter
    # rows 0..23 of the active window: mid-range content shifting exactly
    # by j (the per-slot probe detects j here; these segments are class 0)
    prev = np.zeros((nslots, H, W, 3), np.uint8)
    cur = np.zeros_like(prev)
    mid = rng.integers(80, 160, (nslots, 24, W, 3)).astype(np.uint8)
    prev[:, top : top + 24] = mid
    cur[:, top : top + 24] = mid + j
    # rows 24..47: highlight texture — within each 8-px segment, pixels
    # alternate between near-saturated (250) and mid (100). After the +j
    # shift the 250s clamp to 255, but the real content is an antialiased
    # highlight sitting a little BELOW full saturation: e in {-2 (class 6
    # rows), -5 (class 7 rows)}. delta span = (255+e-250) - (100+j-100)
    # ~ 17 >> 7, so without classes 6/7 these are raw.
    hi = np.where(np.arange(W) % 2 == 0, 250, 100)[None, None, :, None]
    prev[:, top + 24 : top + nh] = hi.astype(np.uint8)
    e_row = np.where(np.arange(24) % 2 == 0, -2, -5)[None, :, None, None]
    shifted = np.clip(hi + j, 0, 255)
    cur[:, top + 24 : top + nh] = np.where(
        hi == 250, shifted + e_row, shifted
    ).astype(np.uint8)
    # slot 1 also gets a true repaint -> raw segments must still appear
    cur[1, top + 4 : top + 8, 8:32] = rng.integers(0, 256, (4, 24, 3), np.uint8)

    nseg = nslots * nh * (W // segw)
    segb = segw * 3
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb

    def run(force_numpy):
        bufs = (
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q2, np.uint8),
            np.zeros(nseg * q3, np.uint8), np.zeros(nseg * qr, np.uint8),
            np.zeros(nseg, np.uint8), np.zeros(nseg, np.uint8),
            np.zeros(nseg * q1, np.uint8), np.zeros(nseg * q1, np.uint8),
            np.zeros(nseg * segb, np.uint8), np.zeros(nseg * segb, np.uint8),
            np.zeros(nseg * 3, np.uint8), np.zeros(nseg, np.uint8),
        )
        counts = native_mod.seg_encode(
            cur, prev, top, nh, segw, *bufs, force_numpy=force_numpy
        )
        return counts, bufs

    cn, bn = run(False)
    cp, bp = run(True)
    if native_mod.get_lib() is not None:
        assert cn == cp
        for a, b in zip(bn, bp):
            assert np.array_equal(a, b)
    counts, bufs_t = cp, bp
    hist = np.bincount(bufs_t[11], minlength=11)
    assert hist[6] > 0 and hist[7] > 0, f"shift-residual never engaged: {hist}"
    # the repaint's fully-random segments land in raw or sparse-byte
    # (whichever is byte-cheaper) — never in the highlight rows' classes
    assert hist[4] + hist[10] > 0, f"repaint class missing: {hist}"
    assert hist[4] <= 12, f"highlight segments leaked to raw: {hist}"

    # device decode bit-exactness through the full assemble path
    sbufs = BatchStream._make_segs_bufs(segw, nseg, nslots * nh * W * 3, 1)
    counts = native_mod.seg_encode(
        cur, prev, top, nh, segw, sbufs["p1"], sbufs["p2"], sbufs["p3"],
        sbufs["raw"], sbufs["m4"], sbufs["m8"], sbufs["s4"],
        sbufs["s8"], sbufs["nib"], sbufs["byte"], sbufs["bias"],
        sbufs["cls"],
    )
    enc = BatchStream._assemble_segs_payload(
        sbufs, 0, counts, (q1, q2, q3, qr), nseg, nslots,
        nslots * nh * W * 3,
    )
    assert enc is not None
    payload, npb = enc
    decode = _segs_decoder(nslots, H, W, top, nh, segw, npb)
    out = np.asarray(
        jax.jit(decode)(jnp.asarray(payload), jnp.asarray(prev.reshape(-1)))
    ).reshape(nslots, H, W, 3)
    expect = cur.copy()
    expect[:, :top] = 114
    expect[:, top + nh :] = 114
    assert np.array_equal(out, expect)


def test_prewarm_buckets_bounded_and_harmless():
    """prewarm_buckets must register neighboring fused-bucket programs
    (so a degraded-terminal night compiles them during warmup, not inside
    a measurement pass), honor the max_programs bound, and leave stream
    results IDENTICAL to an un-prewarmed stream."""
    s = _tiny_stream(batch=2)
    ref = _tiny_stream(batch=2)
    rng = np.random.default_rng(9)
    base = rng.integers(20, 236, (240, 400, 3), np.uint8)
    batches = []
    for t in range(3):
        jit = rng.integers(-4, 5, (1, 1, 3), np.int16)
        f = np.clip(base.astype(np.int16) + jit, 0, 255).astype(np.uint8)
        f[40 + t * 4 : 60 + t * 4, 100:140] = rng.integers(
            0, 256, (20, 40, 3), np.uint8
        )
        batches.append([f, f.copy()])
    try:
        outs = []
        for i, b in enumerate(batches):
            s.submit_batch(b)
            ref.submit_batch(b)
            outs.append((s.collect_batch(), ref.collect_batch()))
            if i == 1 and s._fused_progs:
                before = len(s._fused_progs)
                res = s.prewarm_buckets(max_programs=3)
                assert len(res) <= 3
                assert len(s._fused_progs) >= before
                # prewarmed outputs are real device results
                for r in res:
                    assert np.asarray(r[0]).size > 0
        for got, want in outs:
            assert got == want
    finally:
        s.close()
        ref.close()

"""Native runtime (C++ ring buffer / JSONL / pixel ops) tests.

These exercise the compiled path when the toolchain is present and the
fallback path otherwise; both must behave identically.
"""

import json
import os
import threading

import numpy as np
import pytest

from manual_yolo_tpu.runtime import native


def test_native_lib_builds():
    # in this environment g++ exists, so the native path must come up
    lib = native.get_lib()
    assert lib is not None, "native library failed to build"


def test_frame_ring_fifo_and_latest():
    ring = native.FrameRing(4, (8, 8, 3))
    frames = [np.full((8, 8, 3), i, np.uint8) for i in range(3)]
    for f in frames:
        ring.push(f)
    assert ring.available == 3
    out = ring.pop(latest=False)
    assert int(out[0, 0, 0]) == 0
    out = ring.pop(latest=True)  # drains to newest
    assert int(out[0, 0, 0]) == 2
    assert ring.pop() is None
    ring.close()


def test_frame_ring_drop_oldest():
    ring = native.FrameRing(2, (4, 4, 3))
    for i in range(5):
        ring.push(np.full((4, 4, 3), i, np.uint8))
    assert ring.available <= 2
    assert ring.dropped >= 3
    newest = ring.pop(latest=True)
    assert int(newest[0, 0, 0]) == 4
    ring.close()


def test_frame_ring_threaded():
    import time

    ring = native.FrameRing(8, (16, 16, 3))
    stop = threading.Event()
    got = []

    def producer():
        i = 0
        while not stop.is_set():
            ring.push(np.full((16, 16, 3), i % 251, np.uint8))
            i += 1
            time.sleep(0.0005)

    def consumer():
        deadline = time.time() + 5.0
        while len(got) < 50 and time.time() < deadline:
            f = ring.pop(latest=False)
            if f is not None:
                got.append(int(f[0, 0, 0]))
        stop.set()

    tp = threading.Thread(target=producer, daemon=True)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tc.join(timeout=10)
    stop.set()
    tp.join(timeout=5)
    assert len(got) >= 50
    # FIFO pops are monotonically non-decreasing (modulo counter wrap at 251)
    wraps = sum(1 for a, b in zip(got, got[1:]) if b < a)
    assert wraps <= 1
    ring.close()


def test_frame_ring_no_torn_frames_under_overrun():
    """Producer overruns a tiny ring at full speed; every popped frame must
    be internally consistent (uniform fill) — the wrap overwrite must never
    hand the consumer a half-old half-new frame (seqlock slot protocol)."""
    ring = native.FrameRing(2, (64, 64, 3))
    stop = threading.Event()
    torn = []
    popped = [0]

    def producer():
        i = 0
        while not stop.is_set():
            ring.push(np.full((64, 64, 3), i % 251, np.uint8))
            i += 1

    def consumer():
        import time

        deadline = time.time() + 4.0
        while popped[0] < 2000 and time.time() < deadline:
            f = ring.pop(latest=False)
            if f is None:
                continue
            popped[0] += 1
            if int(f.min()) != int(f.max()):
                torn.append((int(f.min()), int(f.max())))
        stop.set()

    tp = threading.Thread(target=producer, daemon=True)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tc.join(timeout=10)
    stop.set()
    tp.join(timeout=5)
    assert popped[0] >= 100
    assert not torn, f"torn frames observed: {torn[:5]}"
    ring.close()


def test_jsonlog_append(tmp_path):
    p = str(tmp_path / "d.jsonl")
    log = native.JsonLog(p)
    for i in range(10):
        log.append(json.dumps({"frame": i}))
    assert log.lines == 10
    log.close()
    rows = [json.loads(l) for l in open(p)]
    assert [r["frame"] for r in rows] == list(range(10))


def test_jsonlog_append_across_reopen(tmp_path):
    p = str(tmp_path / "d.jsonl")
    log = native.JsonLog(p)
    log.append("{\"a\": 1}")
    log.close()
    log2 = native.JsonLog(p)
    log2.append("{\"a\": 2}")
    log2.close()
    assert len(open(p).readlines()) == 2  # appended, not truncated


def test_bgra_to_bgr():
    rng = np.random.default_rng(0)
    bgra = rng.integers(0, 255, (32, 20, 4), np.uint8)
    out = native.bgra_to_bgr(bgra)
    np.testing.assert_array_equal(out, bgra[..., :3])


def test_crop_u8_clamps():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (50, 60, 3), np.uint8)
    crop = native.crop_u8(img, -5, -5, 20, 25)
    np.testing.assert_array_equal(crop, img[0:20, 0:25])
    crop2 = native.crop_u8(img, 40, 50, 100, 100)
    np.testing.assert_array_equal(crop2, img[40:50, 50:60])
    empty = native.crop_u8(img, 10, 10, 10, 10)
    assert empty.size == 0


def test_nibble_encode_matches_numpy_reference():
    """native nibble_encode must match the numpy encoder semantics
    byte-for-byte (bias choice, mod-256 wraparound, pair packing) over the
    active-row window, and reject span > 15."""
    from manual_yolo_tpu.runtime import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(0)
    B, H, W, top, nh = 3, 32, 16, 5, 20

    def numpy_ref(cur, prev):
        act = cur[:, top : top + nh].astype(np.int16)
        pact = prev[:, top : top + nh].astype(np.int16)
        d = act - pact
        dmax, dmin = d.max(axis=(1, 2)), d.min(axis=(1, 2))
        if int((dmax - dmin).max()) > 15:
            return None
        bias = np.clip(0, dmax - 7, dmin + 8).astype(np.int16)
        v = (d - bias[:, None, None, :] + 8).reshape(-1)
        nib = (v[0::2].astype(np.uint8) & 0xF) | np.left_shift(
            v[1::2], 4
        ).astype(np.uint8)
        return nib, (bias.reshape(-1) % 256).astype(np.uint8)

    prev = rng.integers(0, 255, (B, H, W, 3), np.uint8)
    for case in ("small", "constant", "negative", "clip", "big"):
        if case == "small":
            d = rng.integers(-7, 8, (B, H, W, 3), np.int16)
        elif case == "constant":
            d = np.broadcast_to(
                rng.integers(-12, 13, (B, 1, 1, 3), np.int16), (B, H, W, 3)
            )
        elif case == "negative":
            d = rng.integers(-15, 1, (B, 1, 1, 3), np.int16) + rng.integers(
                0, 2, (B, H, W, 3), np.int16
            )
        elif case == "clip":
            d = rng.integers(120, 128, (B, 1, 1, 3), np.int16) - rng.integers(
                0, 8, (B, H, W, 3), np.int16
            )
        else:  # big: span 255 -> must reject
            d = rng.integers(-128, 128, (B, H, W, 3), np.int16)
        cur = (prev.astype(np.int16) + d).astype(np.uint8)  # mod-256 on purpose
        ref = numpy_ref(cur, prev)
        n_nib = B * nh * W * 3 // 2
        out = np.zeros(n_nib + B * 3, np.uint8)
        ok = native.nibble_encode(
            cur, prev, top, nh, out[:n_nib], out[n_nib:]
        )
        if ref is None:
            assert ok is False, case
        else:
            assert ok is True, case
            np.testing.assert_array_equal(out[:n_nib], ref[0], err_msg=case)
            np.testing.assert_array_equal(out[n_nib:], ref[1], err_msg=case)


def test_tribit_encode_matches_numpy_reference():
    """native tribit_encode: per-row bias choice, 3-bit little-endian
    packing, span-7 rejection — checked against a numpy reimplementation."""
    from manual_yolo_tpu.runtime import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(1)
    B, H, W, top, nh = 2, 24, 16, 3, 18  # W*3 = 48, divisible by 8

    def numpy_ref(cur, prev):
        act = cur[:, top : top + nh].astype(np.int16)
        d = act - prev[:, top : top + nh].astype(np.int16)  # (B, nh, W, 3)
        dmax = d.max(axis=2)  # (B, nh, 3) per row
        dmin = d.min(axis=2)
        if int((dmax - dmin).max()) > 7:
            return None
        bias = np.clip(0, dmax - 3, dmin + 4).astype(np.int16)
        v = ((d - bias[:, :, None, :] + 4) % 256).astype(np.uint8).reshape(-1, 8)
        b0 = v[:, 0] | (v[:, 1] << 3) | ((v[:, 2] & 3) << 6)
        b1 = (v[:, 2] >> 2) | (v[:, 3] << 1) | (v[:, 4] << 4) | ((v[:, 5] & 1) << 7)
        b2 = (v[:, 5] >> 1) | (v[:, 6] << 2) | (v[:, 7] << 5)
        bits = np.stack([b0, b1, b2], axis=-1).reshape(-1).astype(np.uint8)
        return bits, (bias.reshape(-1) % 256).astype(np.uint8)

    prev = rng.integers(0, 255, (B, H, W, 3), np.uint8)
    for case in ("tiny", "rowconst", "negative", "reject"):
        if case == "tiny":
            d = rng.integers(-3, 4, (B, H, W, 3), np.int16)
        elif case == "rowconst":  # constant per row, varying magnitude
            d = np.broadcast_to(
                rng.integers(-30, 31, (B, H, 1, 3), np.int16), (B, H, W, 3)
            )
        elif case == "negative":
            d = rng.integers(-7, 1, (B, H, 1, 3), np.int16) + rng.integers(
                0, 2, (B, H, W, 3), np.int16
            )
        else:  # span 20 in one row -> reject
            d = rng.integers(-3, 4, (B, H, W, 3), np.int16)
            d[1, top + 4, 3, 1] = 20
        cur = (prev.astype(np.int16) + d).astype(np.uint8)
        ref = numpy_ref(cur, prev)
        nb = B * nh * W * 3 * 3 // 8
        n_bias = B * nh * 3
        out = np.zeros(nb + n_bias, np.uint8)
        ok = native.tribit_encode(cur, prev, top, nh, out[:nb], out[nb:])
        if ref is None:
            assert ok is False, case
        else:
            assert ok is True, case
            np.testing.assert_array_equal(out[:nb], ref[0], err_msg=case)
            np.testing.assert_array_equal(out[nb:], ref[1], err_msg=case)


def test_arrays_equal_memcmp():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (120, 192, 3), np.uint8)
    assert native.arrays_equal(a, a)
    assert native.arrays_equal(a, a.copy())
    b = a.copy(); b[60, 90, 1] ^= 1
    assert not native.arrays_equal(a, b)
    assert not native.arrays_equal(a, a[:60])  # shape mismatch
    # non-contiguous falls back to numpy
    v = a[:, ::2]
    assert native.arrays_equal(v, v.copy())


def test_decimate_u8_matches_cv2_inter_linear():
    """Odd-integer downscale: cv2 INTER_LINEAR == point sampling at
    offset (s-1)//2 (the bilinear position is integral), so the native
    gather must be byte-exact."""
    import cv2

    rng = np.random.default_rng(4)
    for (h, w, s) in ((1200, 1920, 3), (600, 960, 3), (1000, 1500, 5)):
        f = rng.integers(0, 255, (h, w, 3), np.uint8)
        dst = np.zeros((h // s, w // s, 3), np.uint8)
        if not native.decimate_u8_into(f, dst, s):
            return  # no native lib on this machine
        ref = cv2.resize(f, (w // s, h // s), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(dst, ref)
    # even stride / mismatched geometry must be refused
    f = rng.integers(0, 255, (800, 1280, 3), np.uint8)
    assert not native.decimate_u8_into(f, np.zeros((400, 640, 3), np.uint8), 2)
    assert not native.decimate_u8_into(f, np.zeros((267, 427, 3), np.uint8), 3)


def test_ctc_score_multi_native_matches_numpy():
    from manual_yolo_tpu.ops import ctc as ctc_ops
    from manual_yolo_tpu.runtime.native import ctc_score_multi_native

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (24, 20)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    cands = [(3, 5), (3, 3), (1,), (7, 7, 2), (), (5, 3, 5, 3)]
    native = ctc_score_multi_native(logp, cands)
    if native is None:
        import pytest

        pytest.skip("native library unavailable")
    ref = np.asarray(
        [ctc_ops.ctc_forward_score(logp, ids) for ids in cands], np.float32
    )
    np.testing.assert_allclose(native, ref, rtol=1e-4, atol=1e-4)


def test_ctc_beam_native_matches_numpy():
    """Native prefix beam must produce the same prefixes/scores as the
    numpy reference implementation (which it replaces on the hot path)."""
    import inspect

    from manual_yolo_tpu.ops import ctc as ctc_ops
    from manual_yolo_tpu.runtime.native import ctc_beam_native

    rng = np.random.default_rng(1)
    for trial in range(6):
        logits = rng.normal(0, 3, (16, 12)).astype(np.float32)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        native = ctc_beam_native(logp, beam_width=6)
        if native is None:
            import pytest

            pytest.skip("native library unavailable")
        # call the numpy body directly by disabling the native fast path
        import manual_yolo_tpu.runtime.native as nat

        orig = nat.ctc_beam_native
        nat.ctc_beam_native = lambda *a, **k: None
        try:
            ref = ctc_ops.prefix_beam_decode(logp, beam_width=6)
        finally:
            nat.ctc_beam_native = orig
        assert [p for p, _ in native] == [p for p, _ in ref], trial
        np.testing.assert_allclose(
            [s for _, s in native], [s for _, s in ref], rtol=1e-4, atol=1e-4
        )

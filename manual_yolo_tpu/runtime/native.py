"""ctypes bindings for the native host runtime (native/runtime.cpp).

Compiles on first import with g++ -O3 (cached by source mtime); every
binding has a pure-Python/numpy fallback so the framework still runs where
no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "runtime.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmyolo_runtime.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib is not False else None
        so = _build()
        if so is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _lib = False
            return None
        lib.fr_create.restype = ctypes.c_void_p
        lib.fr_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
        lib.fr_destroy.argtypes = [ctypes.c_void_p]
        lib.fr_push.restype = ctypes.c_int64
        lib.fr_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fr_pop.restype = ctypes.c_int64
        lib.fr_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
        lib.fr_dropped.restype = ctypes.c_int64
        lib.fr_dropped.argtypes = [ctypes.c_void_p]
        lib.fr_available.restype = ctypes.c_int64
        lib.fr_available.argtypes = [ctypes.c_void_p]
        lib.jl_open.restype = ctypes.c_void_p
        lib.jl_open.argtypes = [ctypes.c_char_p]
        lib.jl_append.restype = ctypes.c_int64
        lib.jl_append.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.jl_lines.restype = ctypes.c_int64
        lib.jl_lines.argtypes = [ctypes.c_void_p]
        lib.jl_close.argtypes = [ctypes.c_void_p]
        lib.bgra_to_bgr.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.bgr_to_rgb.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.crop_u8.restype = ctypes.c_int32
        lib.crop_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p,
        ]
        lib.decimate_u8.restype = None
        lib.decimate_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.nibble_encode.restype = ctypes.c_int32
        lib.nibble_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tribit_encode.restype = ctypes.c_int32
        lib.tribit_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.seg_encode.restype = ctypes.c_int32
        lib.seg_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.ctc_score.restype = ctypes.c_float
        lib.ctc_score.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ctc_score_multi.restype = None
        lib.ctc_score_multi.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.ctc_beam.restype = ctypes.c_int32
        lib.ctc_beam.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        _lib = lib
        return lib


def _buf(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_char_p)


class FrameRing:
    """SPSC frame ring; drop-oldest when full (live-feed policy)."""

    def __init__(self, slots: int, frame_shape, dtype=np.uint8):
        self.shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.slot_bytes = int(np.prod(self.shape)) * self.dtype.itemsize
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.fr_create(slots, self.slot_bytes)
            if not self._h:
                self._lib = None
        if self._lib is None:
            from collections import deque

            self._q = deque(maxlen=slots)
            self._drops = 0

    def push(self, frame: np.ndarray) -> int:
        frame = np.ascontiguousarray(frame, self.dtype)
        assert frame.shape == self.shape, (frame.shape, self.shape)
        if self._lib is not None:
            return int(self._lib.fr_push(self._h, _buf(frame)))
        if len(self._q) == self._q.maxlen:
            self._drops += 1
        self._q.append(frame.copy())
        return len(self._q)

    def pop(self, latest: bool = True) -> Optional[np.ndarray]:
        if self._lib is not None:
            out = np.empty(self.shape, self.dtype)
            seq = self._lib.fr_pop(self._h, _buf(out), 1 if latest else 0)
            return out if seq >= 0 else None
        if not self._q:
            return None
        if latest:
            self._drops += max(0, len(self._q) - 1)
            item = self._q[-1]
            self._q.clear()
            return item
        return self._q.popleft()

    @property
    def dropped(self) -> int:
        if self._lib is not None:
            return int(self._lib.fr_dropped(self._h))
        return self._drops

    @property
    def available(self) -> int:
        if self._lib is not None:
            return int(self._lib.fr_available(self._h))
        return len(self._q)

    def close(self):
        if self._lib is not None and self._h:
            self._lib.fr_destroy(self._h)
            self._h = None


class JsonLog:
    """Append-only JSONL stream (atomic single-write appends)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._lib = get_lib()
        if self._lib is not None:
            self._h = self._lib.jl_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is None:
            self._f = open(path, "a", encoding="utf-8")
            self._n = 0

    def append(self, line: str) -> int:
        raw = line.encode()
        if self._lib is not None:
            return int(self._lib.jl_append(self._h, raw, len(raw)))
        self._f.write(line + "\n")
        self._f.flush()
        self._n += 1
        return len(raw) + 1

    @property
    def lines(self) -> int:
        if self._lib is not None:
            return int(self._lib.jl_lines(self._h))
        return self._n

    def close(self):
        if self._lib is not None:
            if self._h:
                self._lib.jl_close(self._h)
                self._h = None
        else:
            self._f.close()


def bgra_to_bgr(frame_bgra: np.ndarray) -> np.ndarray:
    lib = get_lib()
    h, w = frame_bgra.shape[:2]
    if lib is not None:
        src = np.ascontiguousarray(frame_bgra, np.uint8)
        dst = np.empty((h, w, 3), np.uint8)
        lib.bgra_to_bgr(_buf(src), _buf(dst), h * w)
        return dst
    return np.ascontiguousarray(frame_bgra[..., :3])


def nibble_encode(
    cur: np.ndarray,
    prev: np.ndarray,
    top: int,
    nh: int,
    out_nib: np.ndarray,
    out_bias: np.ndarray,
) -> Optional[bool]:
    """Native tri-mode delta encoder over rows [top, top+nh) of (B, H, W, 3)
    uint8 canvases. Fills ``out_nib`` (packed 4-bit residuals) and
    ``out_bias`` (per-slot-channel bias mod 256). Returns True on success,
    False when any slot-channel delta span exceeds 15 (raw mode), or None
    when the native library is unavailable (caller uses the numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    B, H, W, _ = cur.shape
    assert cur.flags.c_contiguous and prev.flags.c_contiguous
    off = top * W * 3
    ok = lib.nibble_encode(
        cur.ctypes.data + off, prev.ctypes.data + off, B,
        nh * W * 3, H * W * 3,
        out_nib.ctypes.data, out_bias.ctypes.data,
    )
    return bool(ok)


def tribit_encode(
    cur: np.ndarray,
    prev: np.ndarray,
    top: int,
    nh: int,
    out_bits: np.ndarray,
    out_bias: np.ndarray,
) -> Optional[bool]:
    """Native 3-bit-residual delta encoder with per-row biases over rows
    [top, top+nh) of (B, H, W, 3) uint8 canvases. Returns True on success,
    False when any (slot, row, channel) delta span exceeds 7 (caller tries
    the nibble mode), or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    B, H, W, _ = cur.shape
    if (W * 3) % 8 != 0:
        return None
    assert cur.flags.c_contiguous and prev.flags.c_contiguous
    off = top * W * 3
    ok = lib.tribit_encode(
        cur.ctypes.data + off, prev.ctypes.data + off, B, nh, W,
        H * W * 3, out_bits.ctypes.data, out_bias.ctypes.data,
    )
    return bool(ok)


def _seg_encode_numpy(cur_act, prev_act, segw, out_p1, out_p2, out_p3,
                      out_raw, out_m4, out_m8, out_s4, out_s8, out_nib,
                      out_byte, out_bias, out_cls):
    """Vectorized numpy mirror of the native seg_encode (same byte layout,
    same cost-based class selection and tie-breaks); the test oracle and
    the no-toolchain fallback."""
    B, nh, W, _ = cur_act.shape
    seg = W // segw
    segb = segw * 3
    q1 = segb // 8
    # RECENTERED mod-256 delta domain (mirror of the native pass): a
    # wrapped delta classifies via its residue; reconstruction is mod-256
    # throughout, so this is bit-exact
    d = (
        ((cur_act - prev_act) ^ np.uint8(0x80)).astype(np.int16) - 128
    )
    ds = d.reshape(B * nh * seg, segw, 3)
    dmx = ds.max(axis=1)  # (nseg, 3)
    dmn = ds.min(axis=1)
    span = (dmx - dmn).max(axis=1)  # (nseg,)
    # class 5 (clamp-shift): per-SLOT shift candidate j from the first
    # unclippable pixel per channel; a segment qualifies when it is
    # byte-exactly clamp(prev + j)
    pc = prev_act.reshape(B, -1, 3)
    cc = cur_act.reshape(B, -1, 3)
    safe = (pc >= 64) & (pc <= 191)
    has = safe.any(axis=1)  # (B, 3)
    idx = safe.argmax(axis=1)  # (B, 3) first safe pixel per channel
    jj = (
        np.take_along_axis(cc.astype(np.int16), idx[:, None, :], 1)
        - np.take_along_axis(pc.astype(np.int16), idx[:, None, :], 1)
    )[:, 0, :]
    jvalid = has.all(axis=1) & (np.abs(jj) <= 63).all(axis=1)  # (B,)
    nseg_tot = B * nh * seg
    jv_seg = np.repeat(jvalid, nh * seg)
    if jvalid.any():
        pred = np.clip(pc.astype(np.int16) + jj[:, None, :], 0, 255)
        sok_raw = (
            (cc == pred).reshape(nseg_tot, segw * 3).all(axis=1) & jv_seg
        )
        # shift-residual classes 6/7/9: e = cur - clamp(prev + j) —
        # one-sided per channel for 6/7, two-sided nibble for 9. The
        # windows are mod-256 (admission == decodability: an aliased big
        # residual congruent to a small one decodes bit-exactly), mirror
        # of the native u8-lane tests
        e = (cc.astype(np.int16) - pred).reshape(nseg_tot, segw, 3)
        eu = e.astype(np.uint8)

        def _fits(lim):
            pos = (eu <= lim).all(axis=1)  # (nseg, 3)
            neg = ((eu + np.uint8(lim)) <= lim).all(axis=1)
            return ((pos | neg).all(axis=1) & jv_seg), (neg & ~pos)

        fit6, m6 = _fits(3)
        fit7, m7 = _fits(7)
        fit9 = ((eu + np.uint8(8)) <= 15).all(axis=(1, 2)) & jv_seg
        nz_s = (eu != 0).sum(axis=(1, 2))
    else:  # no slot has a shift candidate: skip the full-plane compare
        sok_raw = np.zeros(nseg_tot, bool)
        e = None
        fit6 = fit7 = fit9 = np.zeros(nseg_tot, bool)
        m6 = m7 = np.zeros((nseg_tot, 3), bool)
        nz_s = np.zeros(nseg_tot, np.int64)
    sok = sok_raw & (span != 0)
    # whole-slot clamp-shift (native fast path): every segment of the
    # slot classifies 5, including span-0 ones (identical bytes either
    # way; keeps the class arrays bit-equal between implementations)
    slot_ok = np.repeat(
        sok_raw.reshape(B, -1).all(axis=1) & (jj != 0).any(axis=1),
        nh * seg,
    )
    # const-modal bias (classes 8/10): per-channel MODE of the delta,
    # ties -> smallest value (bincount argmax; matches the native scan)
    nsb = segb // 24  # 24-byte sub-blocks per segment (two-level masks)
    biasc = np.zeros((nseg_tot, 3), np.int16)
    nz_c = np.zeros(nseg_tot, np.int64)
    db_c = np.zeros(nseg_tot, np.int64)
    fit8 = np.zeros(nseg_tot, bool)
    cand = np.where(span > 0)[0]
    if cand.size:
        sub = ds[cand]  # (k, segw, 3)
        off = (sub - dmn[cand][:, None, :]).astype(np.int64)  # [0, 255]
        k = cand.size
        segch = np.arange(k * 3).reshape(k, 3)
        hist = np.bincount(
            (segch[:, None, :] * 256 + off).reshape(-1),
            minlength=k * 3 * 256,
        ).reshape(k, 3, 256)
        bc = dmn[cand] + hist.argmax(axis=2).astype(np.int16)
        biasc[cand] = bc
        u8r = (sub - bc[:, None, :]).astype(np.uint8)  # mod-256 residual
        nz_c[cand] = (u8r != 0).sum(axis=(1, 2))
        db_c[cand] = (
            (u8r != 0).reshape(k, segw * 3).reshape(k, nsb, 24).any(axis=2)
        ).sum(axis=1)
        fit8[cand] = ((u8r + np.uint8(8)) <= 15).all(axis=(1, 2))
    if e is not None:
        db_s = (
            (eu != 0).reshape(nseg_tot, segb).reshape(nseg_tot, nsb, 24)
            .any(axis=2)
        ).sum(axis=1)
    else:
        db_s = np.zeros(nseg_tot, np.int64)
    # exact byte-cost selection (preference on ties: 1,2,6,3,7,8,9,10,raw
    # — argmin returns the first min, so the stack order IS the
    # tie-break). Sparse cost = 1 L byte + 3 per dirty sub-block + values.
    INF = 1 << 30
    q2b, q3b = segb // 4, segb * 3 // 8
    costs = np.stack([
        np.where(span <= 1, q1, INF),
        np.where(span <= 3, q2b, INF),
        np.where(fit6, q2b, INF),
        np.where(span <= 7, q3b, INF),
        np.where(fit7, q3b, INF),
        np.where(fit8, 4 + 3 * db_c + (nz_c + 1) // 2, INF),
        np.where(fit9, 1 + 3 * db_s + (nz_s + 1) // 2, INF),
        4 + 3 * db_c + nz_c,
        np.full(nseg_tot, segb, np.int64),
    ])
    classmap = np.array([1, 2, 6, 3, 7, 8, 9, 10, 4], np.int64)
    cls = np.select(
        [slot_ok, span == 0, sok],
        [5, 0, 5], classmap[costs.argmin(axis=0)],
    )
    out_cls[: cls.size] = cls.astype(np.uint8)
    # biases: const/sparse-const -> modal or exact delta; clamp-shift -> j;
    # 1/2/3-bit -> clipped toward 0; shift-residual -> ((j+64) & 0x7F) |
    # m<<7; sparse-shift -> (j+64) & 0x7F; raw -> 0
    b1 = np.minimum(np.maximum(0, dmx - 1), dmn)
    b2 = np.minimum(np.maximum(0, dmx - 1), dmn + 2)
    b3 = np.minimum(np.maximum(0, dmx - 3), dmn + 4)
    jseg = np.repeat(jj, nh * seg, axis=0)
    m67 = np.where((cls == 6)[:, None], m6, m7)
    b67 = ((jseg + 64) & 0x7F) | (m67.astype(np.int16) << 7)
    b9 = jseg  # class-5 byte convention (mod-256 of the slot shift)
    bias = np.select(
        [cls[:, None] == 0, cls[:, None] == 5, cls[:, None] == 1,
         cls[:, None] == 2, cls[:, None] == 3,
         (cls[:, None] == 6) | (cls[:, None] == 7),
         (cls[:, None] == 8) | (cls[:, None] == 10),
         cls[:, None] == 9],
        [dmn, jseg, b1, b2, b3, b67, biasc, b9], 0,
    ).astype(np.int16)
    out_bias[: cls.size * 3] = (bias.reshape(-1) % 256).astype(np.uint8)
    vflat = ds - bias[:, None, :]  # residuals per segment
    m1 = cls == 1
    m2blk, m3blk, m4 = (cls == 2) | (cls == 6), (cls == 3) | (cls == 7), cls == 4
    k1, k2, k3, kr = (int(m.sum()) for m in (m1, m2blk, m3blk, m4))
    # sparse classes: two-level deviation masks (an L byte whose bits
    # flag dirty 24-byte sub-blocks + a 3-byte little-endian bitmask per
    # dirty sub-block) + nibble/byte exception streams packed
    # contiguously ACROSS segments

    def _two_level(dev, out_l, out_s, kk):
        sb = dev.reshape(kk, nsb, 24)
        dirty = sb.any(axis=2)  # (kk, nsb)
        lpack = np.packbits(dirty, axis=1, bitorder="little")
        out_l[:kk] = lpack[:, 0]
        rows = np.packbits(
            sb.reshape(-1, 24)[dirty.reshape(-1)], axis=1, bitorder="little"
        )  # (d, 3)
        d = rows.shape[0]
        out_s[: 3 * d] = rows.reshape(-1)
        return d

    mm4 = (cls == 8) | (cls == 9)
    mm8 = cls == 10
    k4m, k10m = int(mm4.sum()), int(mm8.sum())
    nz4 = nz8 = d4 = d8 = 0
    if k4m:
        rse = ds - biasc[:, None, :]
        if e is not None:
            rse = np.where((cls == 9)[:, None, None], e, rse)
        rse = rse[mm4].reshape(k4m, segb)
        dev = rse != 0
        d4 = _two_level(dev, out_m4, out_s4, k4m)
        vals = ((rse[dev] + 8) & 0xF).astype(np.uint8)
        nz4 = int(vals.size)
        if nz4 % 2:
            vals = np.append(vals, np.uint8(0))
        out_nib[: vals.size // 2] = vals[0::2] | (vals[1::2] << 4)
    if k10m:
        r10 = (ds - biasc[:, None, :])[mm8].reshape(k10m, segb)
        dev = r10 != 0
        d8 = _two_level(dev, out_m8, out_s8, k10m)
        nz8 = int(dev.sum())
        out_byte[:nz8] = (r10[dev] % 256).astype(np.uint8)
    if k1:
        v = (vflat[m1].reshape(k1, -1, 8) & 1).astype(np.uint8)
        p = (v[..., 0] | v[..., 1] << 1 | v[..., 2] << 2 | v[..., 3] << 3
             | v[..., 4] << 4 | v[..., 5] << 5 | v[..., 6] << 6
             | v[..., 7] << 7)
        out_p1[: k1 * segb // 8] = p.reshape(-1)
    if k2:
        vals2 = vflat + 2
        if e is not None:
            vals2 = np.where(
                (cls == 6)[:, None, None],
                e + 3 * m6[:, None, :].astype(np.int16), vals2,
            )
        v = (vals2[m2blk].reshape(k2, -1) & 3).astype(np.uint8)
        p = (v[:, 0::4] | v[:, 1::4] << 2 | v[:, 2::4] << 4 | v[:, 3::4] << 6)
        out_p2[: k2 * segb // 4] = p.reshape(-1)
    if k3:
        vals3 = vflat + 4
        if e is not None:
            vals3 = np.where(
                (cls == 7)[:, None, None],
                e + 7 * m7[:, None, :].astype(np.int16), vals3,
            )
        v = (vals3[m3blk].reshape(k3, -1, 8) & 7).astype(np.uint8)
        o = np.empty((k3, v.shape[1], 3), np.uint8)
        o[..., 0] = v[..., 0] | v[..., 1] << 3 | (v[..., 2] & 3) << 6
        o[..., 1] = (v[..., 2] >> 2 | v[..., 3] << 1 | v[..., 4] << 4
                     | (v[..., 5] & 1) << 7)
        o[..., 2] = v[..., 5] >> 1 | v[..., 6] << 2 | v[..., 7] << 5
        out_p3[: k3 * segb * 3 // 8] = o.reshape(-1)
    if kr:
        out_raw[: kr * segb] = (
            cur_act.reshape(B * nh * seg, segb)[m4].reshape(-1)
        )
    return k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4, d8


def seg_encode(
    cur: np.ndarray,
    prev: np.ndarray,
    top: int,
    nh: int,
    segw: int,
    out_p1: np.ndarray,
    out_p2: np.ndarray,
    out_p3: np.ndarray,
    out_raw: np.ndarray,
    out_m4: np.ndarray,
    out_m8: np.ndarray,
    out_s4: np.ndarray,
    out_s8: np.ndarray,
    out_nib: np.ndarray,
    out_byte: np.ndarray,
    out_bias: np.ndarray,
    out_cls: np.ndarray,
    force_numpy: bool = False,
):
    """Per-segment multi-class delta encoder over rows [top, top+nh) of
    (B, H, W, 3) uint8 canvases: each segw-pixel segment takes the
    byte-cheapest of const / 1-bit / 2-bit / 3-bit / clamp-shift /
    shift-residual / sparse-exception / raw and its payload appends
    densely per class in scan order (two-level sparse deviation masks +
    shared nibble/byte exception streams included). Returns (n_1bit,
    n_2bit, n_3bit, n_raw, n_mask4, n_mask8, nz_nibbles, nz_bytes,
    n_dirty4, n_dirty8), or None when segw is unusable (not a multiple
    of 8 / not a divisor of W / wider than 64 px)."""
    B, H, W, _ = cur.shape
    if segw % 8 != 0 or W % segw != 0 or segw > 64:
        return None
    assert cur.flags.c_contiguous and prev.flags.c_contiguous
    lib = None if force_numpy else get_lib()
    if lib is None:
        return _seg_encode_numpy(
            cur[:, top : top + nh], prev[:, top : top + nh], segw,
            out_p1, out_p2, out_p3, out_raw, out_m4, out_m8, out_s4,
            out_s8, out_nib, out_byte, out_bias, out_cls,
        )
    off = top * W * 3
    counts = (ctypes.c_int64 * 10)()
    ok = lib.seg_encode(
        cur.ctypes.data + off, prev.ctypes.data + off, B, nh, W,
        H * W * 3, segw, out_p1.ctypes.data, out_p2.ctypes.data,
        out_p3.ctypes.data, out_raw.ctypes.data, out_m4.ctypes.data,
        out_m8.ctypes.data, out_s4.ctypes.data, out_s8.ctypes.data,
        out_nib.ctypes.data, out_byte.ctypes.data,
        out_bias.ctypes.data, out_cls.ctypes.data, ctypes.addressof(counts),
    )
    if not ok:
        return None
    return tuple(int(counts[i]) for i in range(10))


def decimate_u8_into(frame: np.ndarray, dst: np.ndarray, s: int) -> bool:
    """dst[y,x,c] = frame[s*y+off, s*x+off, c] with off=(s-1)//2 — byte-exact
    cv2 INTER_LINEAR for an ODD integer downscale (the bilinear sample
    position is integral, so the kernel weight collapses onto one source
    pixel; verified against cv2 in tests). Returns False when the native
    lib is unavailable or inputs don't qualify — caller falls back to cv2."""
    lib = get_lib()
    if lib is None or s % 2 == 0 or s < 3:
        return False
    oh, ow = dst.shape[:2]
    h, w = frame.shape[:2]
    if h != oh * s or w != ow * s:
        return False
    if not (frame.flags.c_contiguous and dst.flags.c_contiguous):
        return False
    lib.decimate_u8(
        frame.ctypes.data_as(ctypes.c_char_p), w, s, (s - 1) // 2,
        dst.ctypes.data_as(ctypes.c_char_p), oh, ow,
    )
    return True


_libc = ctypes.CDLL(None)
_libc.memcmp.restype = ctypes.c_int
_libc.memcmp.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]


def arrays_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """Byte equality via libc memcmp.

    ``np.array_equal`` always materialises a full elementwise-compare temp
    (~4 ms for a 1920x1200x3 frame on this host); memcmp early-exits at the
    first differing byte — effectively free for frames that changed and
    ~6x faster even when equal. On the streaming hot path this check runs
    once per frame per batch, so it is throughput-critical on a
    single-core host."""
    if a is b:
        return True
    if a.shape != b.shape or a.dtype != b.dtype:
        return False
    if not (a.flags.c_contiguous and b.flags.c_contiguous):
        return bool(np.array_equal(a, b))
    return _libc.memcmp(a.ctypes.data, b.ctypes.data, a.nbytes) == 0


def crop_u8(img: np.ndarray, y1: int, x1: int, y2: int, x2: int) -> np.ndarray:
    lib = get_lib()
    h, w = img.shape[:2]
    y1c, x1c = max(0, y1), max(0, x1)
    y2c, x2c = min(h, y2), min(w, x2)
    if y2c <= y1c or x2c <= x1c:
        return np.zeros((0, 0, 3), np.uint8)
    if lib is not None:
        src = np.ascontiguousarray(img, np.uint8)
        dst = np.empty((y2c - y1c, x2c - x1c, 3), np.uint8)
        lib.crop_u8(_buf(src), h, w, y1c, x1c, y2c, x2c, _buf(dst))
        return dst
    return np.ascontiguousarray(img[y1c:y2c, x1c:x2c])


def ctc_beam_native(logp: np.ndarray, beam_width: int = 8, topk: int = 6,
                    prune_lp: float = -9.0):
    """Native CTC prefix beam search; None when the library is unavailable
    (ops/ctc.py then falls back to its numpy implementation)."""
    lib = get_lib()
    if lib is None:
        return None
    lp = np.ascontiguousarray(logp, np.float32)
    t, c = lp.shape
    max_len = t
    out_ids = np.empty((beam_width, max_len), np.int32)
    out_lens = np.empty((beam_width,), np.int32)
    out_scores = np.empty((beam_width,), np.float32)
    n = lib.ctc_beam(
        lp.ctypes.data, t, c, beam_width, topk, ctypes.c_float(prune_lp),
        out_ids.ctypes.data, out_lens.ctypes.data, out_scores.ctypes.data,
        max_len,
    )
    return [
        (tuple(int(v) for v in out_ids[i, : out_lens[i]]),
         float(out_scores[i]))
        for i in range(n)
    ]


def ctc_score_multi_native(logp: np.ndarray, candidates) -> Optional[np.ndarray]:
    """Score every candidate id-sequence against one (T, C) posterior in a
    single native call; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lp = np.ascontiguousarray(logp, np.float32)
    t, c = lp.shape
    lens = np.asarray([len(s) for s in candidates], np.int32)
    flat = (
        np.concatenate([np.asarray(s, np.int32) for s in candidates])
        if len(candidates) and lens.sum()
        else np.zeros((0,), np.int32)
    )
    flat = np.ascontiguousarray(flat, np.int32)
    out = np.empty((len(candidates),), np.float32)
    lib.ctc_score_multi(
        lp.ctypes.data, t, c, flat.ctypes.data, lens.ctypes.data,
        len(candidates), out.ctypes.data,
    )
    return out

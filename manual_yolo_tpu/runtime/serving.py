"""Pipelined streaming engine — the throughput-serving path.

The fused single-program pipeline (runtime/pipeline.py) minimises latency
but pays two costs per frame on a tunnelled chip: the full 6.9 MB capture
upload, and a ~30 ms completion-notification latency on every blocking
fetch of a just-dispatched program (measured; the compute itself is ~3 ms).
This engine restructures the same work so neither is on the critical path:

  stage H1 (host):   letterbox into a PREALLOCATED canvas (resize writes
                     in place; BGR->RGB happens on device) — ~3 ms
  stage D1 (device): canvas -> detect -> NMS          [async, depth-Q1 queue]
  stage H2 (host):   fetch a LONG-COMPLETE detect result (~1 ms), gather
                     rank crops from the full-res frame (native crop_u8)
  stage D2 (device): batched rank classification      [async, depth-Q2 queue]
  stage H3 (host):   fetch long-complete probabilities, assemble result

With Q1+Q2 ≈ 10 frames in flight, every fetch lands on a result whose
completion notification already arrived, so the host never eats the 30 ms
sync latency; steady-state throughput = max(host work, device work) per
frame. Accuracy semantics match the fused path exactly (same letterbox,
same NMS, classifier crops from the full-resolution frame with the
reference's pad=6 / shortest-side-center-crop semantics).
"""

from __future__ import annotations

import collections
import time
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

from manual_yolo_tpu.game import taxonomy
from manual_yolo_tpu.runtime import native


class StreamingEngine:
    """Throughput-oriented frame pipeline with split detect/classify queues."""

    def __init__(
        self,
        det_params,
        det_spec,
        cls_params,
        cls_spec,
        names: Dict[int, str],
        rank_names: Dict[int, str],
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        max_rank: int = 8,
        crop_pad: int = 6,
        compute_dtype=None,
        use_pallas_nms: Optional[bool] = None,
        detect_depth: int = 6,
        classify_depth: int = 4,
    ):
        import jax
        import jax.numpy as jnp

        from manual_yolo_tpu.models import yolov8
        from manual_yolo_tpu.ops import nms as nms_ops
        from manual_yolo_tpu.ops.pallas_nms import pallas_available

        cdt = compute_dtype or jnp.bfloat16
        if use_pallas_nms is None:
            use_pallas_nms = pallas_available()
        self.names = names
        self.rank_names = rank_names
        self.imgsz = imgsz
        self.max_rank = max_rank
        self.crop_pad = crop_pad
        self.detect_depth = detect_depth
        self.classify_depth = classify_depth
        self._rank_ids = {i for i, n in names.items() if n in taxonomy.RANK_CLASSES}
        self.det_params = det_params
        self.cls_params = cls_params
        self.det_spec = det_spec
        self.cls_spec = cls_spec
        # canvas pool: device_put may read the host buffer after submit
        # returns, so rotate more buffers than frames in flight
        self._canvases = [
            np.full((imgsz, imgsz, 3), 114, np.uint8)
            for _ in range(detect_depth + 3)
        ]
        self._canvas_i = 0
        # resize geometry each pooled canvas was last written with; a change
        # (frame dims changed) means stale pixels sit in the new padding region
        self._canvas_geom: List = [None] * len(self._canvases)
        self._rank_name_cache = dict(rank_names)

        def detect(params, canvas_u8_bgr):
            x = canvas_u8_bgr[..., ::-1].astype(jnp.float32)[None] / 255.0
            raw = yolov8.forward_detect_raw(params, det_spec, x, cdt)
            boxes, scores = yolov8.decode_boxes(raw, (imgsz, imgsz), det_spec.strides)
            return nms_ops.nms(
                boxes[0], scores[0], conf_thres=conf, iou_thres=iou,
                pre_nms=512, max_det=max_det, use_pallas=use_pallas_nms,
            )

        def classify(params, crops_u8_bgr):
            x = crops_u8_bgr[..., ::-1].astype(jnp.float32) / 255.0
            # f32: tiny model; bf16 flips borderline rank reads
            logits = yolov8.forward_classify(params, cls_spec, x, jnp.float32)
            return jax.nn.softmax(logits, axis=-1)

        self._detect = jax.jit(detect)
        self._classify = jax.jit(classify)
        # queue 1 entries: (frame, ratio, (top, left), det_future)
        self._q1: Deque[Tuple] = collections.deque()
        # queue 2 entries: (dets_host, det_idx, probs_future)
        self._q2: Deque[Tuple] = collections.deque()

    # -- host stages ---------------------------------------------------------

    def _letterbox_host(self, frame: np.ndarray):
        import cv2

        from manual_yolo_tpu.ops.letterbox import letterbox_params

        h, w = frame.shape[:2]
        r, nh, nw, top, left = letterbox_params((h, w), (self.imgsz, self.imgsz))
        self._canvas_i = (self._canvas_i + 1) % len(self._canvases)
        canvas = self._canvases[self._canvas_i]
        geom = (nh, nw, top, left)
        if self._canvas_geom[self._canvas_i] != geom:
            canvas[:] = 114  # re-fill padding: frame dims changed for this slot
            self._canvas_geom[self._canvas_i] = geom
        if nw == self.imgsz and canvas[top : top + nh].flags.c_contiguous:
            cv2.resize(frame, (nw, nh), dst=canvas[top : top + nh],
                       interpolation=cv2.INTER_LINEAR)
        else:
            canvas[top : top + nh, left : left + nw] = cv2.resize(
                frame, (nw, nh), interpolation=cv2.INTER_LINEAR
            )
        return canvas, r, (top, left)

    def _gather_rank_crops(self, frame, boxes, classes, scores):
        """Crop+resize rank-class detections (BGR) from the full-res frame."""
        import cv2

        crops = np.zeros((self.max_rank, 64, 64, 3), np.uint8)
        det_idx: List[int] = []
        for i in range(len(scores)):  # already score-descending from NMS
            if len(det_idx) >= self.max_rank:
                break
            if int(classes[i]) not in self._rank_ids:
                continue
            x1, y1, x2, y2 = boxes[i]
            p = self.crop_pad
            crop = frame[
                max(0, int(y1) - p) : int(y2) + p, max(0, int(x1) - p) : int(x2) + p
            ]
            if crop.size == 0:
                continue
            h, w = crop.shape[:2]
            s = 64 / min(h, w)
            nh, nw = max(64, round(h * s)), max(64, round(w * s))
            resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
            t, l = (nh - 64) // 2, (nw - 64) // 2
            crops[len(det_idx)] = resized[t : t + 64, l : l + 64]
            det_idx.append(i)
        return crops, det_idx

    # -- pipeline ------------------------------------------------------------

    def submit(self, frame_bgr: np.ndarray) -> None:
        import jax.numpy as jnp

        canvas, r, pad = self._letterbox_host(frame_bgr)
        fut = self._detect(self.det_params, jnp.asarray(canvas))
        self._q1.append((frame_bgr, r, pad, fut))
        if len(self._q1) > self.detect_depth:
            self._advance_q1()

    def _advance_q1(self) -> None:
        import jax
        import jax.numpy as jnp

        frame, r, (top, left), fut = self._q1.popleft()
        det = jax.device_get(fut)
        n = int(det.count)
        h, w = frame.shape[:2]
        boxes = (det.boxes[:n] - np.array([left, top, left, top], np.float32)) / r
        np.clip(boxes, 0, [w, h, w, h], out=boxes)
        scores = np.asarray(det.scores[:n])
        classes = np.asarray(det.classes[:n])
        crops, det_idx = self._gather_rank_crops(frame, boxes, classes, scores)
        probs_fut = (
            self._classify(self.cls_params, jnp.asarray(crops)) if det_idx else None
        )
        self._q2.append(((boxes, scores, classes), det_idx, probs_fut))

    def _finish_q2(self) -> List[Dict]:
        import jax

        (boxes, scores, classes), det_idx, probs_fut = self._q2.popleft()
        out = [
            {
                "class_id": int(classes[i]),
                "class_name": self.names.get(int(classes[i]), "?"),
                "bbox": [int(v) for v in boxes[i]],
                "conf": round(float(scores[i]), 3),
                "ocr_text": "",
            }
            for i in range(len(scores))
        ]
        if probs_fut is not None:
            from manual_yolo_tpu.game.text import VALID_CARD_RANKS, normalize_rank_text

            probs = jax.device_get(probs_fut)[: len(det_idx)]
            for slot, di in enumerate(det_idx):
                t = int(np.argmax(probs[slot]))
                conf_t = float(probs[slot][t])
                cname = out[di]["class_name"]
                thr = 0.20 if ("turn" in cname or "river" in cname) else 0.40
                if conf_t >= thr:
                    pred = self._rank_name_cache.get(t, "")
                    cleaned = normalize_rank_text(pred)
                    out[di]["ocr_text"] = (
                        cleaned if cleaned in VALID_CARD_RANKS else pred.upper()
                    )
        return out

    def poll(self) -> Optional[List[Dict]]:
        if len(self._q2) > self.classify_depth:
            return self._finish_q2()
        return None

    def drain(self) -> List[List[Dict]]:
        out = []
        while self._q1:
            self._advance_q1()
        while self._q2:
            out.append(self._finish_q2())
        return out

    def process(self, frame_bgr: np.ndarray) -> Optional[List[Dict]]:
        """submit + poll in one call (steady-state streaming API)."""
        self.submit(frame_bgr)
        return self.poll()


def _segs_decoder(nslots, H, W, top, nh, segw, Np, pad_value=114):
    """Build the device-side decoder for a per-segment multi-class delta
    payload (exact mirror of native seg_encode + the host assembly in
    ``BatchStream._assemble_segs_payload``). The returned traced function
    maps (payload_u8, prev_flat_u8) -> the (nslots*H*W*3,) uint8 current
    plane, bit-exactly. Class boundaries inside the payload are DYNAMIC
    (cumsum ranks over the class array), so one compiled program per
    payload-size bucket serves every mix of const/1-bit/2-bit/3-bit/raw
    segments; all payload gathers are row-aligned slices (scatter-free,
    embedding-lookup shaped). Biases ride compressed: a 3-byte default per
    SLOT plus a 1-bit per-segment flag and dense exception triples for the
    segments (clip-boundary ones) whose bias differs from their slot's.
    Rows outside [top, top+nh) are constant ``pad_value`` (the letterbox
    bars for the canvas plane; unused when nh == H)."""
    import jax
    import jax.numpy as jnp

    segb = segw * 3
    q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb
    nseg = nslots * nh * (W // segw)
    segs_per_slot = nh * (W // segw)
    nfl = (nseg + 7) // 8
    ncl = (nseg + 1) // 2
    bot = H - top - nh
    u = jnp.uint8

    def decode(payload_u8, prev_flat_u8):
        # payload layout: [1-bit block | pad %q2 | 2-bit block | pad %q3 |
        # 3-bit block | pad %qr | raw block | L bytes (classes 8/9) |
        # L bytes (class 10) | pad %3 | 3-byte sub-masks (8/9) | 3-byte
        # sub-masks (10) | nibble exceptions | byte exceptions |
        # bias exceptions (3/seg) | zero pad to Np |
        # slot bias defaults (nslots*3) |
        # default-bias flags (nseg/8, bit i of byte j = seg 8j+i) |
        # cls 4-bit packed (nseg/2)]
        bits = payload_u8[:Np]
        o = Np
        slot_bias = payload_u8[o : o + nslots * 3].reshape(nslots, 3)
        o += nslots * 3
        flp = payload_u8[o : o + nfl]
        o += nfl
        clsp = payload_u8[o : o + ncl]
        cls = jnp.stack(
            [jnp.bitwise_and(clsp, u(0xF)), jnp.right_shift(clsp, u(4))],
            axis=-1,
        ).reshape(-1)[:nseg].astype(jnp.int32)
        flag = jnp.stack(
            [
                jnp.bitwise_and(jnp.right_shift(flp, u(k)), u(1))
                for k in range(8)
            ],
            axis=-1,
        ).reshape(-1)[:nseg].astype(bool)
        is1, is2, is3, isr = cls == 1, cls == 2, cls == 3, cls == 4
        is5 = cls == 5  # clamp-shift: cur = clamp(prev + sext(bias))
        # shift-residual: cur = clamp(prev + j) + e; payload shares the
        # 2-bit (class 6) / 3-bit (class 7) blocks
        is6, is7 = cls == 6, cls == 7
        # sparse-exception classes: a deviation-mask row per segment (q1
        # bytes, read through the same 1-bit unpack as p1) + shared
        # nibble (classes 8/9) / byte (class 10) value streams packed
        # contiguously ACROSS segments
        is8, is9, is10 = cls == 8, cls == 9, cls == 10
        ismask4 = is8 | is9
        is2b, is3b = is2 | is6, is3 | is7
        # rank of each segment within its payload BLOCK == its slot
        # (host appends per block in the same scan order)
        i32 = jnp.int32
        r1 = jnp.cumsum(is1.astype(i32)) - 1
        r2 = jnp.cumsum(is2b.astype(i32)) - 1
        r3 = jnp.cumsum(is3b.astype(i32)) - 1
        rr = jnp.cumsum(isr.astype(i32)) - 1
        rm4 = jnp.cumsum(ismask4.astype(i32)) - 1
        rm8 = jnp.cumsum(is10.astype(i32)) - 1
        isx = ~flag
        rx = jnp.cumsum(isx.astype(i32)) - 1
        k1 = jnp.sum(is1.astype(i32))
        k2 = jnp.sum(is2b.astype(i32))
        k3 = jnp.sum(is3b.astype(i32))
        kr = jnp.sum(isr.astype(i32))
        k4m = jnp.sum(ismask4.astype(i32))
        k10m = jnp.sum(is10.astype(i32))
        b2p = ((q1 * k1 + q2 - 1) // q2) * q2
        b3p = ((b2p + q2 * k2 + q3 - 1) // q3) * q3
        brp = ((b3p + q3 * k3 + qr - 1) // qr) * qr
        l4p = brp + qr * kr  # L-byte blocks of the two-level masks
        l8p = l4p + k4m
        s4p = ((l8p + k10m + 2) // 3) * 3  # sub-mask rows: % 3 == 0
        # decode the WHOLE payload under each packing (cheap vector ops);
        # block alignment makes every segment's values land on a whole
        # decoded row: 1-bit rows from byte 0, 2-bit rows from b2p
        # (multiple of q2), 3-bit rows from b3p, raw rows from brp
        dbits = jnp.stack(
            [
                jnp.bitwise_and(jnp.right_shift(bits, u(k)), u(1))
                for k in range(8)
            ],
            axis=-1,
        ).reshape(-1)
        d1 = dbits.reshape(-1, segb)
        d24 = dbits.reshape(-1, 24)  # sub-mask rows (3-byte bitmasks)
        d2 = jnp.stack(
            [
                jnp.bitwise_and(bits, u(3)),
                jnp.bitwise_and(jnp.right_shift(bits, u(2)), u(3)),
                jnp.bitwise_and(jnp.right_shift(bits, u(4)), u(3)),
                jnp.right_shift(bits, u(6)),
            ],
            axis=-1,
        ).reshape(-1, segb)
        b3 = bits.reshape(-1, 3)
        c0, c1, c2 = b3[:, 0], b3[:, 1], b3[:, 2]
        d3 = jnp.stack(
            [
                jnp.bitwise_and(c0, u(7)),
                jnp.bitwise_and(jnp.right_shift(c0, u(3)), u(7)),
                jnp.bitwise_or(
                    jnp.right_shift(c0, u(6)),
                    jnp.left_shift(jnp.bitwise_and(c1, u(1)), u(2)),
                ),
                jnp.bitwise_and(jnp.right_shift(c1, u(1)), u(7)),
                jnp.bitwise_and(jnp.right_shift(c1, u(4)), u(7)),
                jnp.bitwise_or(
                    jnp.right_shift(c1, u(7)),
                    jnp.left_shift(jnp.bitwise_and(c2, u(3)), u(1)),
                ),
                jnp.bitwise_and(jnp.right_shift(c2, u(2)), u(7)),
                jnp.right_shift(c2, u(5)),
            ],
            axis=-1,
        ).reshape(-1, segb)
        draw = bits.reshape(-1, segb)
        g1 = jnp.take(d1, jnp.where(is1, r1, 0), axis=0)
        g2 = jnp.take(d2, jnp.where(is2b, b2p // q2 + r2, 0), axis=0)
        g3 = jnp.take(d3, jnp.where(is3b, b3p // q3 + r3, 0), axis=0)
        gr = jnp.take(draw, jnp.where(isr, brp // qr + rr, 0), axis=0)
        # sparse-exception machinery (two-level masks): gather each
        # sparse segment's L byte, expand its dirty-sub-block bits,
        # locate each dirty sub-block's 3-byte mask row via an exclusive
        # cumsum of L popcounts (segment order == block order), gather
        # and zero-fill the clean sub-blocks, then derive each segment's
        # value-stream offset from the full mask popcount cumsum. All
        # gathers; value gathers clip out-of-range indices and the mask
        # multiply zeroes any clipped garbage — scatter-free.
        nsb = segb // 24
        L4 = jnp.take(bits, jnp.where(ismask4, l4p + rm4, 0)) * ismask4.astype(u)
        L8 = jnp.take(bits, jnp.where(is10, l8p + rm8, 0)) * is10.astype(u)
        lb4 = jnp.stack(
            [jnp.bitwise_and(jnp.right_shift(L4, u(k)), u(1))
             for k in range(nsb)],
            axis=-1,
        )  # (nseg, nsb)
        lb8 = jnp.stack(
            [jnp.bitwise_and(jnp.right_shift(L8, u(k)), u(1))
             for k in range(nsb)],
            axis=-1,
        )
        pd4 = lb4.astype(i32).sum(axis=1)
        pd8 = lb8.astype(i32).sum(axis=1)
        s8p = s4p + 3 * jnp.sum(pd4)
        nibp = s8p + 3 * jnp.sum(pd8)
        base4 = (jnp.cumsum(pd4) - pd4)[:, None] + (
            jnp.cumsum(lb4.astype(i32), axis=1) - lb4.astype(i32)
        )
        base8 = (jnp.cumsum(pd8) - pd8)[:, None] + (
            jnp.cumsum(lb8.astype(i32), axis=1) - lb8.astype(i32)
        )
        m4b = (
            jnp.take(d24, jnp.where(lb4.astype(bool), s4p // 3 + base4, 0),
                     axis=0)
            * lb4[..., None]
        ).reshape(nseg, segb)
        m8b = (
            jnp.take(d24, jnp.where(lb8.astype(bool), s8p // 3 + base8, 0),
                     axis=0)
            * lb8[..., None]
        ).reshape(nseg, segb)
        pc4 = m4b.astype(i32).sum(axis=1)
        pc8 = m8b.astype(i32).sum(axis=1)
        in4 = jnp.cumsum(m4b.astype(i32), axis=1) - m4b.astype(i32)
        in8 = jnp.cumsum(m8b.astype(i32), axis=1) - m8b.astype(i32)
        idx4 = (jnp.cumsum(pc4) - pc4)[:, None] + in4
        nibbyte = jnp.take(bits, nibp + idx4 // 2)
        v4 = jnp.where(
            (idx4 & 1).astype(bool),
            jnp.right_shift(nibbyte, u(4)),
            jnp.bitwise_and(nibbyte, u(0xF)),
        )
        r4v = (v4 - u(8)) * m4b  # signed nibble, mod-256; 0 off-mask
        bytp = nibp + (jnp.sum(pc4) + 1) // 2
        idx8 = (jnp.cumsum(pc8) - pc8)[:, None] + in8
        r8v = jnp.take(bits, bytp + idx8) * m8b
        bep = bytp + jnp.sum(pc8)  # bias-exception block start
        # per-segment bias: the slot default, or the ranked exception
        seg_slot = jnp.arange(nseg, dtype=i32) // segs_per_slot
        bias_def = jnp.take(slot_bias, seg_slot, axis=0)  # (nseg, 3)
        xbase = bep + 3 * jnp.where(isx, rx, 0)
        bias_exc = jnp.stack(
            [jnp.take(bits, xbase + ch) for ch in range(3)], axis=-1
        )
        bias = jnp.where(flag[:, None], bias_def, bias_exc)
        prev = prev_flat_u8.reshape(nslots, H, W, 3)
        pact = jax.lax.slice_in_dim(prev, top, top + nh, axis=1).reshape(
            nseg, segb
        )
        biasx = jnp.broadcast_to(bias[:, None, :], (nseg, segw, 3)).reshape(
            nseg, segb
        )
        delta = (
            jnp.where(
                is1[:, None], g1,
                jnp.where(
                    is2[:, None], g2 - u(2),
                    jnp.where(is3[:, None], g3 - u(4), u(0)),
                ),
            )
            + biasx
        )  # uint8 wraparound -> bit-exact
        # class-5 lanes saturate instead of wrapping (brightness shift
        # with clipping); bias is the signed shift mod 256
        shifted = jnp.clip(
            pact.astype(jnp.int16)
            + biasx.astype(jnp.int8).astype(jnp.int16),
            0, 255,
        ).astype(u)
        # classes 6/7: bias byte = ((j + 64) & 0x7F) | m<<7 — saturating
        # shift by j plus a one-sided residual from the shared 2/3-bit
        # block (e = v - m*lim, added mod 256: bit-exact by construction)
        j67 = jnp.bitwise_and(biasx, u(0x7F)).astype(jnp.int16) - 64
        m67 = jnp.right_shift(biasx, u(7))  # u8 0/1
        shifted67 = jnp.clip(
            pact.astype(jnp.int16) + j67, 0, 255
        ).astype(u)
        new6 = shifted67 + g2 + m67 * u(253)  # +e, e = v - 3m (mod 256)
        new7 = shifted67 + g3 + m67 * u(249)  # +e, e = v - 7m (mod 256)
        # sparse classes: const base (8/10) or clamp-shift base (9; its
        # bias byte uses the class-5 signed-j convention, so the class-5
        # `shifted` plane IS its base — and the byte equals the slot
        # default on a photometric tick, riding the flag compression),
        # plus the masked exception values
        new8 = pact + biasx + r4v
        new9 = shifted + r4v
        new10 = pact + biasx + r8v
        newseg = jnp.where(
            isr[:, None], gr,
            jnp.where(
                is5[:, None], shifted,
                jnp.where(
                    is6[:, None], new6,
                    jnp.where(
                        is7[:, None], new7,
                        jnp.where(
                            is8[:, None], new8,
                            jnp.where(
                                is9[:, None], new9,
                                jnp.where(
                                    is10[:, None], new10, pact + delta
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        )
        act = newseg.reshape(nslots, nh, W, 3)
        if nh == H:
            return act.reshape(-1)
        canv = jnp.pad(
            act, ((0, 0), (top, bot), (0, 0), (0, 0)),
            constant_values=np.uint8(pad_value),
        )
        return canv.reshape(-1)

    return decode


def _copy_results(out):
    """Pristine copy of a batch's results (list[list[dict]], scalar values
    except the bbox list). ~10x faster than copy.deepcopy, which walks the
    memo machinery per object — this runs once per batch on the finisher
    thread of a single-core host."""
    return [[dict(d, bbox=list(d["bbox"])) for d in dets] for dets in out]


class BatchStream:
    """Batched throughput pipeline: amortise tunnel round trips over B frames.

    On host-attached/tunnelled chips each host<->device transfer costs a
    ~30 ms round trip regardless of size (measured), while the detect
    program itself runs in ~2 ms — so per-frame transfers cap throughput
    near 15 fps no matter how fast the model is. This engine moves B frames
    per transfer, and in the steady state makes ONE device_put and ONE
    fetch per batch: the canvas delta payload and the classifier-crop
    plane (gathered PREDICTIVELY at the rects the last finished batch
    used — hysteresis keeps them stable on static UI) ride in the same
    upload, a single fused program runs decode -> detect -> NMS -> crop
    decode -> classify, and one flat readback carries detections AND rank
    probabilities. The finisher re-classifies only detections whose rect
    prediction missed (new/moved cards). Two batches stay in flight so
    the link streams while the device computes.

    ``delta=True`` enables tri-mode canvas streaming against the previous
    batch (VNC-style, lossless — detection numerics identical to raw mode):

      * **skip**  — batch is byte-identical to the previous one: upload
        NOTHING; the device reuses its resident canvas copy.
      * **nibble** — for each slot and channel the arithmetic delta's
        (max - min) span is <= 15, so delta - bias fits a signed nibble
        [-8, 7] for EVERY pixel with bias in [dmax-7, dmin+8] (bias is
        clipped toward 0 so a zero-delta region packs as 0x88 bytes, the
        most transit-compressible encoding). Upload ONE flat payload of
        4-bit-packed residuals (HALF the bytes) + per-slot-channel biases;
        the device unpacks and wraparound-adds — bit-exact. Covers global
        photometric shifts (one value per channel +- clipping), dithering,
        capture noise.
      * **tribit** — tighter variant of nibble used when every (slot, row,
        channel) delta span is <= 7: per-ROW biases + 3-bit residuals
        (8 values per 3 bytes) = 3/8 the raw bytes. Native-encoded;
        active-geometry batches only.
      * **slots** — at most B/4 slots changed (one table repainted in a
        multi-table fleet): upload ONLY those slots' active rows, raw;
        the device gathers them into the resident canvas (scatter-free
        gather + where). Slot-count bucketed to powers of two, one
        program per (geometry, bucket).
      * **segs** — per-SEGMENT multi-class coding (each row splits into 8
        segments; every segment independently lands in const / 2-bit /
        3-bit / raw by its delta span). Payloads append densely per class;
        the device recovers each segment's payload position with cumsum
        ranks over the class array and three aligned row gathers —
        scatter-free, offset-free on the wire. Handles MIXED streams
        (global jitter + local repaints) that defeat the whole-batch span
        tests of tribit/nibble, at ~1/3 of the tribit bytes on the bench's
        jittered stream (most segments are const after a per-segment
        bias). Program key is (geometry, payload-size bucket) — class
        boundaries are dynamic, so one program serves any class mix.
      * **raw**   — dense wide-span change: upload the full canvas batch.

    **Active-rows upload**: when every slot shares one letterbox geometry
    with full-width content (the steady-state capture case — e.g.
    1920x1200 -> 640x400 content centered in a 640x640 canvas), only the
    content rows are uploaded and the device pads the constant-114
    letterbox bars back on (``jnp.pad``, fused into the detect program).
    That removes the padding bytes — 37.5 % of every raw AND nibble payload
    at 1920x1200 — from the link, bit-exactly.

    Why this matters on a tunnelled chip: the FIRST device->host download
    of any size (even a 4-byte scalar fetch) permanently drops the
    process's host->device upload rate from ~1.5 GB/s to ~40-100 MB/s
    (measured; no recovery after 6+ min idle; independent of which
    programs ran). A serving loop necessarily downloads results, so its
    uploads always run post-flip — making upload BYTES the binding
    resource. See docs/BENCH_NOTES.md for the full isolation.
    """

    def __init__(
        self,
        det_params,
        det_spec,
        cls_params,
        cls_spec,
        names: Dict[int, str],
        rank_names: Dict[int, str],
        batch: int = 32,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        max_rank: int = 8,
        crop_pad: int = 6,
        compute_dtype=None,
        use_pallas_nms: Optional[bool] = None,
        delta: bool = True,
        readback_det: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp

        from manual_yolo_tpu.models import yolov8
        from manual_yolo_tpu.ops import nms as nms_ops
        from manual_yolo_tpu.ops.pallas_nms import pallas_available

        cdt = compute_dtype or jnp.bfloat16
        if use_pallas_nms is None:
            use_pallas_nms = pallas_available()
        self.B = batch
        # host-side pipeline depth: staging/payload buffers rotate this
        # deep, and the dispatcher queue holds N_PIPE-3 undispatched
        # batches — deep enough that on HIGH-LATENCY tunnel nights
        # (measured 2026-08-21: ~0.5 s per crossing at healthy bandwidth)
        # several batches stay in flight across the put/compute/fetch
        # stages instead of the pipe draining between crossings
        self.N_PIPE = 6
        self.names = names
        self.rank_names = dict(rank_names)
        self.imgsz = imgsz
        self.max_det = max_det
        # steady-state readback bound: only the top readback_det NMS slots
        # cross the link; the full max_det plane is fetched on overflow.
        # <= 254 so the u8 count byte (capped at readback_det + 1) can
        # say "exceeded" unambiguously
        self.readback_det = min(readback_det or 64, max_det, 254)
        self.readback_overflows = 0
        self.max_rank = max_rank
        self.crop_pad = crop_pad
        self._rank_ids = {i for i, n in names.items() if n in taxonomy.RANK_CLASSES}
        self.det_params = det_params
        self.cls_params = cls_params
        self.det_spec = det_spec
        self.cls_spec = cls_spec
        # staging pool: batch N+1 fills while N uploads on the dispatcher
        # thread and up to N_PIPE-3 wait in its queue — N_PIPE buffers
        # cover fill + upload + the queued batches
        self._staging = [
            np.full((batch, imgsz, imgsz, 3), 114, np.uint8)
            for _ in range(self.N_PIPE)
        ]
        self._staging_i = 0
        self.delta = delta
        n_px = batch * imgsz * imgsz * 3
        self._n_nib = n_px // 2
        self._n_bias = batch * 3
        # one flat payload per batch = ONE device_put: post-flip every put
        # pays a ~60 ms fixed stall on top of the rate cap, so splitting
        # nibbles/biases into separate uploads would cost more than the
        # bytes they carry. (staging slot N stays alive as the next
        # submit's delta reference)
        self._nibbuf = [
            np.zeros((self._n_nib + self._n_bias,), np.uint8)
            for _ in range(self.N_PIPE)
        ]
        self._prev_staging: Optional[np.ndarray] = None
        self._prev_frames: List[Optional[np.ndarray]] = [None] * batch
        self._prev_metas: List = [None] * batch
        self._slot_geom: Dict = {}
        self.memo_hits = 0
        self._dev_prev = jnp.zeros((n_px,), jnp.uint8)
        self.mode_counts = {
            "raw": 0, "nibble": 0, "tribit": 0, "slots": 0, "segs": 0,
            "skip": 0,
        }
        self._slots_progs: Dict[Tuple[int, int, int], object] = {}
        self._segs_progs: Dict[Tuple[int, int, int], object] = {}
        # seg-mode host buffers, lazily sized per active-height
        self._segs_bufs: Dict[int, Dict] = {}
        # canvas segment width: 40 px measured cheapest on jittered table
        # streams once the bias block rides compressed (tools/
        # segs_byte_model.py); smaller widths pay more flag/class overhead
        # than their extra const segments save
        # (<= 64: the two-level sparse masks' L byte covers 8 sub-blocks)
        self._segw = next(
            (w for w in (40, 32, 48, 64, 16, 24, 8) if imgsz % w == 0),
            None,
        )
        # per-slot mode engages when at most this many slots changed (beyond
        # that the dense tribit/nibble payloads are byte-cheaper)
        self._slots_max = max(1, batch // 4)

        dmax = self.readback_det

        def detect_core(params, canvases_flat_u8):
            canvases_u8_bgr = canvases_flat_u8.reshape(batch, imgsz, imgsz, 3)
            x = canvases_u8_bgr[..., ::-1].astype(jnp.float32) / 255.0
            raw = yolov8.forward_detect_raw(params, det_spec, x, cdt)
            boxes, scores = yolov8.decode_boxes(raw, (imgsz, imgsz), det_spec.strides)
            det = jax.vmap(
                lambda b, s: nms_ops.nms(
                    b, s, conf_thres=conf, iou_thres=iou, pre_nms=512,
                    max_det=max_det, use_pallas=use_pallas_nms,
                )
            )(boxes, scores)
            # packed u8 wire format (round 5): the steady-state fetch is a
            # count-bounded slice — NMS returns score-descending, a table
            # frame carries ~30-60 detections, so only the top
            # ``readback_det`` slots cross the link, 12 bytes per slot:
            # 4 coords as u16 fixed-point (x16: 1/16 px <= the f16 wire's
            # 0.5 px rounding), score u16 (1/65535 < the 3 decimals the
            # host keeps), class u8, capped count u8. 64x300x7 f16
            # (2.7 MB) -> 64x64x12 u8 (49 KB) per batch. The FULL f16
            # plane is still a program output, resident in HBM — the host
            # fetches it only when some frame's count exceeds the bound
            # (rare; counted in ``readback_overflows``).
            bx = jnp.clip(det.boxes[:, :dmax], 0, imgsz)
            q16 = jnp.round(bx * 16).astype(jnp.uint16)  # (B, dmax, 4)
            sc = jnp.round(
                jnp.clip(det.scores[:, :dmax], 0, 1) * 65535
            ).astype(jnp.uint16)
            u16 = jnp.concatenate([q16, sc[..., None]], axis=-1)
            lo = jnp.bitwise_and(u16, jnp.uint16(0xFF)).astype(jnp.uint8)
            hi = jnp.right_shift(u16, jnp.uint16(8)).astype(jnp.uint8)
            b2 = jnp.stack([lo, hi], axis=-1).reshape(batch, dmax, 10)
            clsb = det.classes[:, :dmax].astype(jnp.uint8)[..., None]
            cnt = jnp.minimum(det.count, dmax + 1).astype(jnp.uint8)
            cntb = jnp.broadcast_to(cnt[:, None, None], (batch, dmax, 1))
            small = jnp.concatenate([b2, clsb, cntb], axis=-1)
            full = jnp.concatenate(
                [
                    det.boxes,
                    det.scores[..., None],
                    det.classes[..., None].astype(jnp.float32),
                    jnp.broadcast_to(
                        det.count[:, None, None].astype(jnp.float32),
                        (batch, max_det, 1),
                    ),
                ],
                axis=-1,
            ).astype(jnp.float16)  # (B, max_det, 7), fetched on overflow
            return small.reshape(-1), full.reshape(-1), canvases_flat_u8

        def detect_raw(params, canvas_flat_u8):
            # flat uint8 input: multi-dim uint8 device_put pays a host-side
            # relayout (~17x slower through the tunnel); reshape on device
            return detect_core(params, canvas_flat_u8)

        n_nib, n_bias = self._n_nib, self._n_bias

        def nibble_decode_full(payload_u8, prev_flat_u8):
            # payload = [packed residual nibbles | per-slot-channel bias
            # (mod 256)]. nibble byte i = v[2i] | v[2i+1] << 4,
            # v = (delta - bias + 8) mod 256 in [0, 15]; uint8 wraparound
            # adds make the reconstruction bit-exact. (No scatter here on
            # purpose: a sparse-corrections variant compiled to a 67 MB
            # TPU executable — scatter over a 39M-element array is poison.)
            nib = payload_u8[:n_nib]
            bias = payload_u8[n_nib:].reshape(batch, 1, 1, 3)
            lo = jnp.bitwise_and(nib, jnp.uint8(0xF))
            hi = jnp.right_shift(nib, jnp.uint8(4))
            v = jnp.stack([lo, hi], axis=-1).reshape(
                batch, imgsz, imgsz, 3
            )
            return (
                prev_flat_u8.reshape(batch, imgsz, imgsz, 3)
                + (v - jnp.uint8(8))
                + bias
            ).reshape(-1)

        nibble_dec_full = jax.jit(nibble_decode_full)

        def detect_nibble(params, payload_u8, prev_flat_u8):
            # decode/compute split: the full-canvas nibble path only runs
            # on geometry changes — chain the small decode into the shared
            # compute program instead of owning a big fused executable
            return self._run_compute(
                params, nibble_dec_full(payload_u8, prev_flat_u8)
            )

        def detect_skip(params, prev_flat_u8):
            return detect_core(params, prev_flat_u8)

        def classify_batch(params, crops_flat_u8):
            crops_u8_bgr = crops_flat_u8.reshape(batch * max_rank, 64, 64, 3)
            x = crops_u8_bgr[..., ::-1].astype(jnp.float32) / 255.0
            # f32 compute: tiny model; bf16 flips borderline rank reads.
            # u8 WIRE only — probabilities quantized to 1/255 (the runtime
            # compares them to 0.20/0.40 thresholds and argmaxes; 0.004
            # granularity is far inside both margins), concatenating with
            # the u8 packed detections into one fetch
            logits = yolov8.forward_classify(params, cls_spec, x, jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.round(probs * 255).astype(jnp.uint8).reshape(-1)

        self._detect_raw = jax.jit(detect_raw)
        self._detect_nibble = detect_nibble  # plain chain (decode + compute)
        self._detect_skip = jax.jit(detect_skip)
        self._classify = jax.jit(classify_batch)
        self._detect_core = detect_core
        self._classify_core = classify_batch

        def compute_fused(det_p, cls_p, canvases_flat_u8, crops_flat_u8):
            small, full, dev = detect_core(det_p, canvases_flat_u8)
            probs = classify_batch(cls_p, crops_flat_u8)
            return jnp.concatenate([small, probs]), full, dev, crops_flat_u8

        # THE one big program: detect + NMS + pack + rank-classify over
        # resident (already-decoded) planes. Every dispatch mode routes
        # through it; per-bucket payload DECODE runs as its own small
        # program immediately before (the decoded plane stays in HBM and
        # the extra dispatch is free — calls pipeline asynchronously, only
        # the final value fetch synchronises). This caps the cold-cache
        # cost at ONE multi-minute XLA compile instead of one ~26 MB
        # executable per (geometry, payload-bucket) combination — the
        # round-2/3 driver bench attempts died serially compiling those
        # through the tunnel before any measurement pass could finish.
        self._compute_fused = jax.jit(compute_fused)
        self._nd_flat = batch * self.readback_det * 12
        # small decode-program caches (cheap compiles, many keys)
        self._decode_canvas_progs: Dict[Tuple, object] = {}
        self._decode_crops_progs: Dict[Tuple, object] = {}
        # crop-plane delta state (worker thread only): previous batch's
        # classifier crops on host (encode reference) and device (decode
        # reference) — the crop upload was half the link bytes once the
        # canvas went per-segment
        self._prev_crops: Optional[np.ndarray] = None
        self._dev_prev_crops = None
        # probs device array of the last _classify_crops call (worker
        # thread only): reused verbatim on crop-skip batches
        self._dev_last_cls_probs = None
        self._crop_segs_bufs: Optional[Dict] = None
        # crop-rect hysteresis: class_id -> recent crop rects (finisher
        # thread only); see _stable_rect
        self._rect_cache: Dict[int, List[Tuple[int, int, int, int]]] = {}
        # predictive fused classify (segs canvas mode): the submit thread
        # gathers crops from the CURRENT frames at the rects the last
        # finished batch used (static UI -> rects are hysteresis-stable),
        # ships them inside the SAME device_put as the canvas payload, and
        # one fused program returns detections AND rank probabilities —
        # collapsing the steady state from 2 puts + 2 fetches to 1 + 1.
        # The finisher verifies each actual detection's rect against the
        # prediction and re-classifies only the (rare) misses.
        self._pred_rects: List[List[Tuple[int, Tuple[int, int, int, int]]]] = [
            [] for _ in range(batch)
        ]
        # per-slot TTL ages for predicted pairs (finisher thread only)
        self._pred_ages: List[Dict] = [{} for _ in range(batch)]
        # predicted-plane delta chain, disjoint from the finisher's
        # _prev_crops chain: encode reference written only by the submit
        # thread, device reference written only by the dispatcher (zeros
        # until the first fused batch establishes the real plane)
        self._pred_prev_crops: Optional[np.ndarray] = None
        self._dev_pred_crops = jnp.zeros(
            (batch * max_rank * 64 * 64 * 3,), jnp.uint8
        )
        self._pred_segs_bufs: Optional[Dict] = None
        self._fused_progs: Dict[Tuple, object] = {}
        self._cls_spec = cls_spec
        self._classify_small_progs: Dict[int, object] = {}
        self.fused_hits = 0
        self.fused_misses = 0
        self.fallback_batches = 0
        self._classify_segs_progs: Dict[int, object] = {}
        self.crop_mode_counts = {
            "raw": 0, "segs": 0, "skip": 0, "fused_segs": 0, "fused_raw": 0,
        }
        # active-rows program cache: (top, nh) -> (raw_fn, nibble_fn)
        self._active_progs: Dict[Tuple[int, int], Tuple] = {}
        # delta scratch per active-height (contiguous, so reshape(-1) on the
        # residual is a view, not a 10+ MB copy per batch). Lazy: only the
        # numpy fallback of _encode_nibble needs it, and that path never
        # runs when the native encoder library is present — eager allocation
        # would pin 78-157 MB of untouched int16 per stream
        self._delta_scratch: Dict[int, np.ndarray] = {}
        # letterbox geometry of the previous batch's device canvas: active
        # nibble decode leaves the padding rows untouched, so it is only
        # valid when the resident canvas's padding is known to be 114 there
        self._prev_geom: Optional[Tuple[int, int]] = None
        # set by the dispatcher/worker threads when a batch fails after the
        # submit thread already advanced the host delta references: the
        # device-resident planes no longer match them, so the next
        # submit_batch must fall back to raw and re-establish the chain
        self._delta_broken = False
        self._pending: Deque[Dict] = collections.deque()

        # Two pipeline workers besides the caller's thread:
        #
        # Dispatcher: through this tunnelled client a device_put BLOCKS the
        # calling thread for the whole transfer (~130 ms for a nibble batch)
        # plus a ~60 ms fixed stall — run on the submit thread it would
        # serialise the upload against letterbox/encode of the NEXT batch.
        # A dedicated thread performs the device calls in submission order
        # (it is also the only writer of _dev_prev, keeping the delta chain
        # sequential), so upload(t) overlaps staging(t+1).
        #
        # Finisher: the client only makes transfer progress while a host
        # thread blocks on it, so async dispatch alone gives no overlap. A
        # daemon thread runs the ENTIRE tail of each batch (packed-result
        # fetch -> host crop gather -> classify dispatch -> probability
        # fetch -> result assembly) off the critical path.
        # collect_batch() just waits for the oldest item.
        import queue as queue_mod
        import threading

        # maxsize bounds undispatched batches: staging/payload buffers
        # rotate N_PIPE-deep, so at most N_PIPE-3 may sit behind the one
        # being uploaded (one slot stays free for the batch being filled)
        self._dispatch_q: "queue_mod.Queue" = queue_mod.Queue(
            maxsize=self.N_PIPE - 3
        )

        # always-on per-stage wall timings (seconds, one entry per batch):
        # submit_letterbox / submit_encode / submit_crops / submit_queue /
        # dispatch (device_put + program launch) / fetch_wait (device
        # compute + readback) / finish_tail (host assembly + fallbacks).
        # Cost is a few perf_counter calls per 32-frame batch; read with
        # stage_summary().
        # bounded: the forever-serve mode appends one float per batch per
        # stage — an unbounded list is a slow leak; stage_summary only needs
        # recent batches
        self.stage_stats: Dict[str, Deque[float]] = collections.defaultdict(
            lambda: collections.deque(maxlen=4096)
        )

        def _dispatcher():
            import time as _time

            import jax.numpy as _jnp

            while True:
                item = self._dispatch_q.get()
                if item is None:
                    # forward the shutdown sentinel so it lands AFTER any
                    # batch this thread already pushed (close() putting it
                    # into _work_q directly could overtake an in-flight
                    # batch and leave its evt forever unset)
                    self._work_q.put(None)
                    return
                _t0 = _time.perf_counter()
                try:
                    mode = item.pop("mode")
                    if mode == "skip":
                        fut, full, dev, _ = self._compute_fused(
                            self.det_params, self.cls_params,
                            self._dev_prev, self._dev_pred_crops,
                        )
                    elif mode == "nibble":
                        fut, full, dev = item.pop("nibble_fn")(
                            self.det_params,
                            _jnp.asarray(item.pop("payload")),
                            self._dev_prev,
                        )
                    elif mode == "tribit":
                        fut, full, dev = item.pop("tribit_fn")(
                            self.det_params,
                            _jnp.asarray(item.pop("payload")),
                            self._dev_prev,
                        )
                    elif mode == "segs":
                        fut, full, dev = item.pop("segs_fn")(
                            self.det_params,
                            _jnp.asarray(item.pop("payload")),
                            self._dev_prev,
                        )
                    elif mode == "fused":
                        fut, full, dev, devk = item.pop("fused_fn")(
                            self.det_params, self.cls_params,
                            _jnp.asarray(item.pop("payload")),
                            self._dev_prev, self._dev_pred_crops,
                        )
                        self._dev_pred_crops = devk
                    elif mode == "slots":
                        fut, full, dev = item.pop("slots_fn")(
                            self.det_params,
                            _jnp.asarray(item.pop("payload")),
                            _jnp.asarray(item.pop("g")),
                            _jnp.asarray(item.pop("mask")),
                            self._dev_prev,
                        )
                    elif mode == "raw_active":
                        fut, full, dev = item.pop("raw_fn")(
                            self.det_params, _jnp.asarray(item.pop("act"))
                        )
                    else:
                        fut, full, dev, _ = self._compute_fused(
                            self.det_params, self.cls_params,
                            _jnp.asarray(item.pop("flat")),
                            self._dev_pred_crops,
                        )
                    if self.delta:
                        self._dev_prev = dev
                    item["fut"] = fut
                    item["fut_full"] = full
                    item["fetch_evt"] = threading.Event()
                    self.stage_stats["dispatch"].append(
                        _time.perf_counter() - _t0
                    )
                except BaseException as e:  # surfaces in collect_batch
                    self._delta_broken = True
                    item["err"] = e
                    item["evt"].set()
                    continue
                self._prefetch_q.put(item)
                self._work_q.put(item)

        self._work_q: "queue_mod.Queue" = queue_mod.Queue()
        # prefetch stage: the value FETCH of a batch's readback is pure
        # tunnel latency (measured seconds per round trip on a degraded
        # night, for a 56 KB array), and the tunnel serves CONCURRENT
        # fetches ~3x faster than serial ones (measured 2026-08-21). Two
        # prefetch threads pull dispatched items and materialise the u8
        # readback so consecutive batches' fetch latencies OVERLAP; the
        # worker (which must run in batch order for the prediction/crop
        # chains) just waits on the per-item event and gets host bytes.
        self._prefetch_q: "queue_mod.Queue" = queue_mod.Queue()

        def _prefetcher():
            while True:
                item = self._prefetch_q.get()
                if item is None:
                    return
                t0 = time.perf_counter()
                try:
                    item["np_flat"] = np.asarray(item["fut"])
                    self.stage_stats["fetch_wait"].append(
                        time.perf_counter() - t0
                    )
                except BaseException as e:
                    item["fetch_err"] = e
                item["fetch_evt"].set()

        self._prefetch_threads = [
            threading.Thread(target=_prefetcher, daemon=True)
            for _ in range(2)
        ]
        for _t in self._prefetch_threads:
            _t.start()

        # two-stage finisher: stage A (worker) fetches + assembles +
        # DISPATCHES the miss-fallback classify without blocking on it;
        # stage B (applier) blocks on the fallback probabilities and
        # applies them. The miss round trip is mostly link latency, not
        # CPU — overlapping it with the next batch's assembly buys its
        # full ~60 ms back on every batch that has a prediction miss.
        self._apply_q: "queue_mod.Queue" = queue_mod.Queue()
        self._applier_has_last = False

        def _worker():
            while True:
                item = self._work_q.get()
                if item is None:
                    for _ in self._prefetch_threads:
                        self._prefetch_q.put(None)
                    self._apply_q.put(None)
                    return
                try:
                    item["fetch_evt"].wait()
                    if "fetch_err" in item:
                        raise item["fetch_err"]
                    if item["memo"] and self._applier_has_last:
                        # identical input -> identical output; stage B
                        # still awaits the dispatched detect for device
                        # backpressure (the prefetch already synced it,
                        # but the 4-byte applier fetch stays as belt and
                        # braces)
                        item["_memo"] = True
                    elif "pred" in item:
                        item["_apply"] = self._finish_batch_fused(
                            item["frames"], item["metas"], item["np_flat"],
                            item["pred"], item.get("fut_full"),
                        )
                    else:
                        item["_apply"] = self._finish_batch(
                            item["frames"], item["metas"], item["np_flat"],
                            item.get("fut_full"),
                        )
                except BaseException as e:  # re-raised in collect_batch
                    self._delta_broken = True
                    # the crop-plane chain is worker-owned and may have been
                    # half-updated — force the next classify to ride raw
                    self._prev_crops = None
                    self._dev_last_cls_probs = None
                    item["err"] = e
                    item["evt"].set()
                    continue
                self._apply_q.put(item)

        def _applier():
            import jax as _jax

            last_out = None
            while True:
                item = self._apply_q.get()
                if item is None:
                    return
                try:
                    t0 = time.perf_counter()
                    if item.pop("_memo", False):
                        # REAL device backpressure: block_until_ready lies
                        # through the axon tunnel (resolves before the
                        # remote exec finishes — tools/roofline_probe.py),
                        # so an all-memo stretch would count batches the
                        # device never ran. One fetched element waits for
                        # the whole serial queue at one small round-trip.
                        if item["fut"] is not None:
                            float(item["fut"][0])  # 4-byte fetch, full sync
                        if last_out is None:
                            raise RuntimeError("memo batch before any result")
                        item["out"] = _copy_results(last_out)
                        self.memo_hits += 1
                    elif "_apply" in item:
                        results, probs_fut, rows, pairs = item.pop("_apply")
                        if pairs:
                            probs = np.asarray(probs_fut).reshape(rows, -1)
                            for row, (bi, di) in pairs:
                                self._apply_rank_prob(results, bi, di, probs[row])
                        item["out"] = results
                    # pristine copy: callers may mutate what they collect
                    last_out = _copy_results(item["out"])
                    self._applier_has_last = True
                    self.stage_stats["apply_wait"].append(
                        time.perf_counter() - t0
                    )
                except BaseException as e:
                    item["err"] = e
                item["evt"].set()

        self._worker_thread = threading.Thread(target=_worker, daemon=True)
        self._worker_thread.start()
        self._applier_thread = threading.Thread(target=_applier, daemon=True)
        self._applier_thread.start()
        self._dispatch_thread = threading.Thread(target=_dispatcher, daemon=True)
        self._dispatch_thread.start()

    def _run_compute(self, det_params, canvases_flat_u8):
        """Run the shared compute program on a decoded canvas plane.
        Returns (packed|probs readback, full-plane overflow fallback,
        canvas passthrough) — the 3-tuple the non-fused dispatch modes
        expect."""
        fut, full, dev, _ = self._compute_fused(
            det_params, self.cls_params, canvases_flat_u8,
            self._dev_pred_crops,
        )
        return fut, full, dev

    def _get_active_progs(self, top: int, nh: int):
        """Lazily build small jitted DECODE programs that take ONLY the
        content rows ``[top, top+nh)`` and pad the 114 letterbox bars on
        device, then chain into the shared compute program (decode/compute
        split: per-geometry programs stay seconds-cheap to compile)."""
        key = (top, nh)
        if key not in self._active_progs:
            import jax
            import jax.numpy as jnp

            B, imgsz = self.B, self.imgsz
            bot = imgsz - top - nh
            n_act = B * nh * imgsz * 3

            def raw_decode(act_flat_u8):
                act = act_flat_u8.reshape(B, nh, imgsz, 3)
                canv = jnp.pad(
                    act, ((0, 0), (top, bot), (0, 0), (0, 0)),
                    constant_values=np.uint8(114),
                )
                return canv.reshape(-1)

            raw_dec = jax.jit(raw_decode)

            def raw_active(params, act_flat_u8):
                return self._run_compute(params, raw_dec(act_flat_u8))

            def nibble_decode(payload_u8, prev_flat_u8):
                nib = payload_u8[: n_act // 2]
                bias = payload_u8[n_act // 2 :].reshape(B, 1, 1, 3)
                lo = jnp.bitwise_and(nib, jnp.uint8(0xF))
                hi = jnp.right_shift(nib, jnp.uint8(4))
                v = jnp.stack([lo, hi], axis=-1).reshape(B, nh, imgsz, 3)
                resid = (v - jnp.uint8(8)) + bias  # uint8 wraparound
                resid_full = jnp.pad(resid, ((0, 0), (top, bot), (0, 0), (0, 0)))
                return (
                    prev_flat_u8.reshape(B, imgsz, imgsz, 3) + resid_full
                ).reshape(-1)

            nibble_dec = jax.jit(nibble_decode)

            def nibble_active(params, payload_u8, prev_flat_u8):
                return self._run_compute(
                    params, nibble_dec(payload_u8, prev_flat_u8)
                )

            def tribit_decode(payload_u8, prev_flat_u8):
                # 8 3-bit values per 3 bytes (little-endian across bytes,
                # mirror of native tribit_encode), per-ROW biases
                nb = n_act * 3 // 8
                bits = payload_u8[:nb].reshape(-1, 3)
                b0, b1, b2 = bits[:, 0], bits[:, 1], bits[:, 2]
                u = jnp.uint8
                v = jnp.stack(
                    [
                        jnp.bitwise_and(b0, u(7)),
                        jnp.bitwise_and(jnp.right_shift(b0, u(3)), u(7)),
                        jnp.bitwise_or(
                            jnp.right_shift(b0, u(6)),
                            jnp.left_shift(jnp.bitwise_and(b1, u(1)), u(2)),
                        ),
                        jnp.bitwise_and(jnp.right_shift(b1, u(1)), u(7)),
                        jnp.bitwise_and(jnp.right_shift(b1, u(4)), u(7)),
                        jnp.bitwise_or(
                            jnp.right_shift(b1, u(7)),
                            jnp.left_shift(jnp.bitwise_and(b2, u(3)), u(1)),
                        ),
                        jnp.bitwise_and(jnp.right_shift(b2, u(2)), u(7)),
                        jnp.right_shift(b2, u(5)),
                    ],
                    axis=-1,
                ).reshape(B, nh, imgsz, 3)
                bias = payload_u8[nb:].reshape(B, nh, 1, 3)
                resid = (v - u(4)) + bias  # uint8 wraparound
                resid_full = jnp.pad(resid, ((0, 0), (top, bot), (0, 0), (0, 0)))
                return (
                    prev_flat_u8.reshape(B, imgsz, imgsz, 3) + resid_full
                ).reshape(-1)

            tribit_dec = jax.jit(tribit_decode)

            def tribit_active(params, payload_u8, prev_flat_u8):
                return self._run_compute(
                    params, tribit_dec(payload_u8, prev_flat_u8)
                )

            self._active_progs[key] = {
                "raw": raw_active,
                "nibble": nibble_active,
                "tribit": tribit_active,
            }
        return self._active_progs[key]

    def _get_slots_prog(self, top: int, nh: int, kp: int):
        """Per-SLOT update program: kp changed slots' active rows replace
        their canvas slots (gather + where — scatter-free); unchanged slots
        keep the resident canvas. One compiled program per (geometry,
        bucket) pair, built lazily."""
        key = (top, nh, kp)
        if key not in self._slots_progs:
            import jax
            import jax.numpy as jnp

            B, imgsz = self.B, self.imgsz
            bot = imgsz - top - nh

            def slots_decode(payload_u8, g_i32, mask_b, prev_flat_u8):
                act = payload_u8.reshape(kp, nh, imgsz, 3)
                upd = jnp.pad(
                    act, ((0, 0), (top, bot), (0, 0), (0, 0)),
                    constant_values=np.uint8(114),
                )
                gathered = upd[g_i32]  # (B, imgsz, imgsz, 3)
                prev = prev_flat_u8.reshape(B, imgsz, imgsz, 3)
                return jnp.where(
                    mask_b[:, None, None, None], gathered, prev
                ).reshape(-1)

            slots_dec = jax.jit(slots_decode)

            def slots_active(params, payload_u8, g_i32, mask_b, prev_flat_u8):
                return self._run_compute(
                    params, slots_dec(payload_u8, g_i32, mask_b, prev_flat_u8)
                )

            self._slots_progs[key] = slots_active
        return self._slots_progs[key]

    def _get_decode_canvas(self, top: int, nh: int, np_bucket: int,
                           ctotal: int):
        """Small jitted canvas-segs decode: full payload in (the canvas
        section is the leading ``ctotal`` bytes), decoded canvas plane out.
        One cheap compile per (geometry, bucket); shape-specialises per
        total payload length (also cheap)."""
        key = (top, nh, np_bucket, ctotal)
        if key not in self._decode_canvas_progs:
            import jax

            decode = _segs_decoder(
                self.B, self.imgsz, self.imgsz, top, nh, self._segw,
                np_bucket,
            )
            self._decode_canvas_progs[key] = jax.jit(
                lambda payload, prev: decode(payload[:ctotal], prev)
            )
        return self._decode_canvas_progs[key]

    def _get_decode_crops(self, np_bucket: int, ctotal: int):
        """Small jitted crop-plane decode: full payload in (crop section
        starts at ``ctotal``; np_bucket < 0 means the crop plane rides raw
        and the decode is a plain slice), decoded crop plane out."""
        key = (np_bucket, ctotal)
        if key not in self._decode_crops_progs:
            import jax

            ns = self.B * self.max_rank
            if np_bucket >= 0:
                decode = _segs_decoder(ns, 64, 64, 0, 64, 64, np_bucket)
                fn = jax.jit(
                    lambda payload, prevk: decode(payload[ctotal:], prevk)
                )
            else:
                nk = ns * 64 * 64 * 3
                fn = jax.jit(
                    lambda payload, prevk: payload[ctotal : ctotal + nk]
                )
            self._decode_crops_progs[key] = fn
        return self._decode_crops_progs[key]

    def _get_segs_prog(self, top: int, nh: int, np_bucket: int):
        """Canvas-plane segs step: small decode program chained into the
        shared compute program (decode/compute split — see
        ``_compute_fused``)."""
        key = (top, nh, np_bucket)
        if key not in self._segs_progs:

            def segs_active(params, payload_u8, prev_flat_u8):
                dec = self._get_decode_canvas(
                    top, nh, np_bucket, int(payload_u8.shape[0])
                )
                return self._run_compute(
                    params, dec(payload_u8, prev_flat_u8)
                )

            self._segs_progs[key] = segs_active
        return self._segs_progs[key]

    def _get_classify_segs_prog(self, np_bucket: int):
        """Crop-plane segs step: decode the crop delta against the
        device-resident previous crops (small program), classify via the
        STANDALONE classifier program, and return BOTH the probabilities
        and the decoded crop plane (the next batch's delta reference).
        Saves the 3.1 MB/batch crop upload — after the canvas delta work
        that upload had become HALF the link bytes. (Round 4: this used to
        ride the shared compute program, re-running the full detect graph
        on the resident canvas just to reach the classify — ~2x detect
        device time on every non-fused batch; advisor r3.)"""
        key = np_bucket
        if key not in self._classify_segs_progs:
            import jax

            decode = _segs_decoder(
                self.B * self.max_rank, 64, 64, 0, 64, 64, np_bucket
            )
            dec = jax.jit(decode)

            def classify_segs(params, payload_u8, prev_flat_u8):
                cur = dec(payload_u8, prev_flat_u8)
                return self._classify(params, cur), cur

            self._classify_segs_progs[key] = classify_segs
        return self._classify_segs_progs[key]

    def _get_classify_small(self, ns: int):
        """Cached classify program over ``ns`` crops (power-of-2 bucket).
        The fused-mode miss fallback typically re-classifies a handful of
        crops; uploading the full B*max_rank plane (~3 MB) for that costs
        more link time than the whole batch's delta payload."""
        if ns not in self._classify_small_progs:
            import jax
            import jax.numpy as jnp

            from manual_yolo_tpu.models import yolov8

            cls_spec = self._cls_spec

            def classify_small(params, crops_flat_u8):
                crops = crops_flat_u8.reshape(ns, 64, 64, 3)
                x = crops[..., ::-1].astype(jnp.float32) / 255.0
                logits = yolov8.forward_classify(params, cls_spec, x, jnp.float32)
                probs = jax.nn.softmax(logits, axis=-1)
                # u8 wire like the batch classifier (see classify_batch)
                return jnp.round(probs * 255).astype(jnp.uint8).reshape(-1)

            self._classify_small_progs[ns] = jax.jit(classify_small)
        return self._classify_small_progs[ns]

    def _get_fused_prog(self, top: int, nh: int, npc: int, npk: int):
        """One dispatch chain for the whole batch step: canvas segs decode
        (small per-bucket program) -> crop-plane decode (segs bucket
        ``npk``, or a raw-slice program when ``npk < 0``) -> the shared
        compute program (detect + classify). Returns ONE flat u8 readback
        (count-bounded packed detections | u8 rank probabilities), the
        resident full f16 detection plane (fetched only on count
        overflow), and the two decoded planes that become the next
        batch's delta references. Steady state is still one device_put
        and one fetch per batch — the chained dispatches pipeline
        asynchronously and only the fetch pays the tunnel's ~60 ms
        crossing stall — but a new payload bucket costs a seconds-cheap
        decode compile instead of re-compiling the whole ~26 MB
        detect+classify executable."""
        key = (top, nh, npc, npk)
        if key not in self._fused_progs:
            nseg_c = self.B * nh * (self.imgsz // self._segw)
            ctotal = (
                npc + self.B * 3 + (nseg_c + 7) // 8 + (nseg_c + 1) // 2
            )

            def fused(det_params, cls_params, payload_u8, prev_flat_u8,
                      prev_crops_u8):
                canv = self._get_decode_canvas(top, nh, npc, ctotal)(
                    payload_u8, prev_flat_u8
                )
                crops = self._get_decode_crops(npk, ctotal)(
                    payload_u8, prev_crops_u8
                )
                return self._compute_fused(
                    det_params, cls_params, canv, crops
                )

            self._fused_progs[key] = fused
        return self._fused_progs[key]

    @staticmethod
    def _make_segs_bufs(segw, nseg, raw_bytes, n_pay):
        """Host scratch for one segs-encoded plane geometry."""
        segb = segw * 3
        q1, q2, q3, qr = segb // 8, segb // 4, segb * 3 // 8, segb
        lcm = int(np.lcm.reduce([q1, q2, q3, qr]))
        # Np bucket step: multiple of lcm(q1..qr) so every decoded view
        # reshapes to whole rows; ~raw/8 capped at 1024*lcm. A smaller
        # step was tried in round 5 (finer buckets -> less zero pad) and
        # REVERTED: every distinct bucket is a decode program the
        # TERMINAL compiles at first execution per process — 150-330 s
        # each on a degraded night (measured 2026-08-21), so bucket
        # count IS cold-start wall time, and the bench runs died
        # discovering buckets inside measurement passes. The coarse step
        # keeps the steady state inside 1-2 buckets per plane (the r4
        # driver runs' behavior); the pad is zeros, which ride the
        # compressing link at ~2x the rate of content bytes.
        step = lcm * max(1, min(1024, raw_bytes // (8 * lcm)))
        trailer = 3 * nseg + (nseg + 7) // 8 + (nseg + 1) // 2 + 3 * nseg
        cap = ((raw_bytes // 2 + step - 1) // step) * step + trailer
        return {
            "p1": np.zeros(nseg * q1, np.uint8),
            "p2": np.zeros(nseg * q2, np.uint8),
            "p3": np.zeros(nseg * q3, np.uint8),
            "raw": np.zeros(nseg * qr, np.uint8),
            # sparse-exception classes (8/9/10): two-level deviation
            # masks — one L byte per sparse segment (dirty-sub-block
            # bits) + a 3-byte bitmask per dirty 24-byte sub-block — and
            # nibble/byte value streams packed contiguously across
            # segments. Sized for the worst case the cost-based
            # selection can emit (all sub-blocks dirty: 3*(segb/24) = q1
            # sub-mask bytes per segment)
            "m4": np.zeros(nseg, np.uint8),
            "m8": np.zeros(nseg, np.uint8),
            "s4": np.zeros(nseg * q1, np.uint8),
            "s8": np.zeros(nseg * q1, np.uint8),
            "nib": np.zeros(nseg * segb, np.uint8),
            "byte": np.zeros(nseg * segb, np.uint8),
            "bias": np.zeros(nseg * 3, np.uint8),
            "cls": np.zeros(nseg, np.uint8),
            # payload buffers rotate with the staging pool: a dispatched
            # payload must stay untouched until its device_put completes
            "pay": [np.zeros(cap, np.uint8) for _ in range(n_pay)],
            "step": step,
        }

    def _encode_crop_plane_segs(self, crops, prev, bufs, pay_i):
        """Segs-encode a (B*max_rank, 64, 64, 3) crop plane against a
        previous plane (full-row segments: 64 px keeps the bias+class
        overhead small). Returns (payload_view, np_bucket) or None ->
        upload raw."""
        ns, ch, cw, _ = crops.shape
        segw = cw  # one segment per row
        segb = segw * 3
        qs = (segb // 8, segb // 4, segb * 3 // 8, segb)
        nseg = ns * ch
        raw_bytes = ns * ch * cw * 3
        counts = native.seg_encode(
            crops, prev, 0, ch, segw,
            bufs["p1"], bufs["p2"], bufs["p3"], bufs["raw"], bufs["m4"],
            bufs["m8"], bufs["s4"], bufs["s8"], bufs["nib"],
            bufs["byte"], bufs["bias"], bufs["cls"],
        )
        if counts is None:
            return None
        return self._assemble_segs_payload(
            bufs, pay_i, counts, qs, nseg, ns, raw_bytes
        )

    def _encode_crop_segs(self, crops: np.ndarray):
        """Finisher-thread crop delta (the non-fused classify path)."""
        if self._crop_segs_bufs is None:
            # 4 rotating pay buffers: since the classify await moved to the
            # applier thread, the worker no longer blocks until the payload
            # transfer drains — the buffer must stay untouched until then
            # (same reason the canvas path rotates 4)
            self._crop_segs_bufs = self._make_segs_bufs(
                64, crops.shape[0] * 64, crops.size, self.N_PIPE
            )
        self._crop_pay_i = (
            (getattr(self, "_crop_pay_i", -1) + 1) % self.N_PIPE
        )
        return self._encode_crop_plane_segs(
            crops, self._prev_crops, self._crop_segs_bufs, self._crop_pay_i
        )

    def _build_fused_payload(self, frames, canvas_payload):
        """Submit-thread half of the fused step: gather crops from the
        CURRENT frames at the last finished batch's rects, delta-encode
        them against the previous predicted plane, and append to the
        canvas payload. Returns (combined_payload, npk, pred_snapshot);
        npk = -1 means the crop plane rides raw (bootstrap, or delta not
        beneficial)."""
        pred = [list(p) for p in self._pred_rects]  # finisher swaps the ref
        ns = self.B * self.max_rank
        crops = np.zeros((ns, 64, 64, 3), np.uint8)
        for bi in range(self.B):
            for j, (cid, rect) in enumerate(pred[bi][: self.max_rank]):
                c = self._gather_crop_u8(frames[bi], rect)
                if c is not None:
                    crops[bi * self.max_rank + j] = c
        npk, kpay = -1, None
        if self._pred_prev_crops is not None:
            if self._pred_segs_bufs is None:
                self._pred_segs_bufs = self._make_segs_bufs(
                    64, ns * 64, crops.size, self.N_PIPE
                )
            enc = self._encode_crop_plane_segs(
                crops, self._pred_prev_crops, self._pred_segs_bufs,
                self._staging_i % self.N_PIPE,
            )
            if enc is not None:
                kpay, npk = enc
        if kpay is None:
            kpay = crops.reshape(-1)
        self._pred_prev_crops = crops
        # diagnostic byte split: canvas delta vs crop-plane delta
        self.stage_stats["canvas_mb"].append(canvas_payload.nbytes / 1e6)
        self.stage_stats["crops_mb"].append(kpay.nbytes / 1e6)
        return np.concatenate([canvas_payload, kpay]), npk, pred

    @staticmethod
    def _assemble_segs_payload(bufs, pay_i, counts, qs, nseg, nslots, raw_bytes):
        """Lay out [p1 | p2 | p3 | raw | L4 bytes | L8 bytes | pad %3 |
        s4 sub-masks | s8 sub-masks | nibble exceptions | byte exceptions
        | bias exceptions | pad | slot bias defaults | flags | cls] in one
        flat buffer (class blocks aligned so the device decoder's rows
        land exactly; the 3-byte sub-mask rows start on a %3 boundary so
        they land on whole 24-bit unpack rows). The dense per-segment
        bias block compresses to a 3-byte default per slot (the modal
        bias — the photometric shift) + a 1-bit flag per segment +
        exception triples for the (clip-boundary) segments that deviate.
        Returns (payload_view, np_bucket) or None when not beneficial."""
        q1, q2, q3, qr = qs
        k1, k2, k3, kr, k4m, k10m, nz4, nz8, d4, d8 = counts
        sps = nseg // nslots  # segments per slot
        bias = bufs["bias"][: nseg * 3].reshape(nslots, sps, 3)
        # per-slot per-channel modal bias via one bincount per channel
        slot_idx = np.arange(nslots, dtype=np.int64)[:, None] * 256
        defaults = np.empty((nslots, 3), np.uint8)
        for ch in range(3):
            cnt = np.bincount(
                (slot_idx + bias[:, :, ch]).reshape(-1),
                minlength=nslots * 256,
            ).reshape(nslots, 256)
            defaults[:, ch] = cnt.argmax(axis=1).astype(np.uint8)
        flags = (bias == defaults[:, None, :]).all(axis=2).reshape(-1)
        exc = bias.reshape(-1, 3)[~flags]
        ke = exc.shape[0]
        nfl = (nseg + 7) // 8
        ncl = (nseg + 1) // 2
        b2p = ((q1 * k1 + q2 - 1) // q2) * q2  # 2-bit block: % q2 == 0
        b3p = ((b2p + q2 * k2 + q3 - 1) // q3) * q3  # 3-bit block: % q3 == 0
        brp = ((b3p + q3 * k3 + qr - 1) // qr) * qr  # raw block: % qr == 0
        l4p = brp + qr * kr  # L-byte blocks (byte gathers)
        l8p = l4p + k4m
        s4p = ((l8p + k10m + 2) // 3) * 3  # sub-mask rows: % 3 == 0
        s8p = s4p + 3 * d4
        nibp = s8p + 3 * d8  # value streams (unaligned: byte gathers)
        nibb = (nz4 + 1) // 2
        bytp = nibp + nibb
        bep = bytp + nz8  # bias-exception block
        used = bep + 3 * ke
        step = bufs["step"]
        np_bucket = max(step, ((used + step - 1) // step) * step)
        total = np_bucket + nslots * 3 + nfl + ncl
        if total >= raw_bytes // 2:  # nibble/raw would be no worse
            return None
        pay = bufs["pay"][pay_i]
        pay[: q1 * k1] = bufs["p1"][: q1 * k1]
        pay[q1 * k1 : b2p] = 0
        pay[b2p : b2p + q2 * k2] = bufs["p2"][: q2 * k2]
        pay[b2p + q2 * k2 : b3p] = 0
        pay[b3p : b3p + q3 * k3] = bufs["p3"][: q3 * k3]
        pay[b3p + q3 * k3 : brp] = 0
        pay[brp:l4p] = bufs["raw"][: qr * kr]
        pay[l4p:l8p] = bufs["m4"][:k4m]
        pay[l8p : l8p + k10m] = bufs["m8"][:k10m]
        pay[l8p + k10m : s4p] = 0
        pay[s4p:s8p] = bufs["s4"][: 3 * d4]
        pay[s8p:nibp] = bufs["s8"][: 3 * d8]
        pay[nibp:bytp] = bufs["nib"][:nibb]
        pay[bytp:bep] = bufs["byte"][:nz8]
        pay[bep:used] = exc.reshape(-1)
        pay[used:np_bucket] = 0  # bucket pad: zeros compress in transit
        o = np_bucket
        pay[o : o + nslots * 3] = defaults.reshape(-1)
        o += nslots * 3
        pay[o : o + nfl] = np.packbits(flags, bitorder="little")
        o += nfl
        cls = bufs["cls"][:nseg]
        if nseg % 2:
            cls = np.append(cls, np.uint8(0))
        pay[o : o + ncl] = cls[0::2] | cls[1::2] << 4
        return pay[:total], np_bucket

    def _encode_segs(self, staging: np.ndarray, top: int, nh: int):
        """Build the segs-mode payload over the active rows. Returns
        (payload_view, np_bucket) or None when the encoding isn't
        beneficial (caller falls back to tribit/nibble/raw)."""
        imgsz = self.imgsz
        segw = self._segw
        if segw is None:
            return None
        segb = segw * 3
        qs = (segb // 8, segb // 4, segb * 3 // 8, segb)
        nsegrow = imgsz // segw
        nseg = self.B * nh * nsegrow
        raw_act = self.B * nh * imgsz * 3
        bufs = self._segs_bufs.get(nh)
        if bufs is None:
            bufs = self._make_segs_bufs(segw, nseg, raw_act, self.N_PIPE)
            self._segs_bufs[nh] = bufs
        counts = native.seg_encode(
            staging, self._prev_staging, top, nh, segw,
            bufs["p1"], bufs["p2"], bufs["p3"], bufs["raw"], bufs["m4"],
            bufs["m8"], bufs["s4"], bufs["s8"], bufs["nib"],
            bufs["byte"], bufs["bias"], bufs["cls"],
        )
        if counts is None:
            return None
        # diagnostic: per-class segment counts for this canvas encode
        # (k1/k2/k3/kraw/kmask4/kmask8/nz_nib/nz_byte; const+clamp-shift =
        # nseg - k1-k2-k3-kraw-kmask4-kmask8) — bench and the stage probe
        # read these to attribute link bytes to delta classes
        self.stage_stats["canvas_seg_counts"].append(
            (nseg,) + tuple(counts)
        )
        return self._assemble_segs_payload(
            bufs, self._staging_i % self.N_PIPE, counts, qs, nseg,
            self.B, raw_act
        )

    def _batch_geom(self, metas) -> Optional[Tuple[int, int]]:
        """(top, nh) when every slot letterboxed to the SAME full-width
        geometry (active-rows upload applies); None otherwise."""
        g0 = metas[0][2] if metas and metas[0] is not None else None
        if g0 is None or g0[1] != self.imgsz:  # nw must span full width
            return None
        for m in metas:
            if m is None or m[2] != g0 or m[1][1] != 0:
                return None
        return (metas[0][1][0], g0[0])  # (top, nh)

    def _encode_tribit(
        self, staging: np.ndarray, top: int, nh: int
    ) -> Optional[np.ndarray]:
        """3-bit residuals + per-row biases over the active rows (native
        encoder only; 3/8 the raw bytes). None -> try nibble/raw."""
        n_val = self.B * nh * self.imgsz * 3
        nb = n_val * 3 // 8
        n_bias = self.B * nh * 3
        payload = self._nibbuf[self._staging_i]
        if nb + n_bias > payload.size:
            return None
        ok = native.tribit_encode(
            staging, self._prev_staging, top, nh,
            payload[:nb], payload[nb : nb + n_bias],
        )
        if not ok:  # False (span > 7) or None (no native lib)
            return None
        return payload[: nb + n_bias]

    def _encode_nibble(
        self, staging: np.ndarray, top: int = 0, nh: Optional[int] = None
    ) -> Optional[np.ndarray]:
        """Build the bias+nibble payload over rows [top, top+nh), or None
        -> raw mode.

        Fits iff each slot-channel's delta span (max - min) <= 15: then a
        bias in [dmax-7, dmin+8] puts EVERY residual in the signed-nibble
        range [-8, 7]. Bias is clipped toward 0 so unchanged regions pack
        as constant 0x88 bytes (maximally transit-compressible). All
        arithmetic is mod 256 -> reconstruction is bit-exact.
        """
        B = self.B
        nh = self.imgsz if nh is None else nh
        n_nib = B * nh * self.imgsz * 3 // 2
        payload = self._nibbuf[self._staging_i]
        ok = native.nibble_encode(
            staging, self._prev_staging, top, nh,
            payload[:n_nib], payload[n_nib : n_nib + self._n_bias],
        )
        if ok is not None:  # native encoder ran (~25x the numpy path)
            return payload[: n_nib + self._n_bias] if ok else None
        scratch = self._delta_scratch.get(nh)
        if scratch is None:
            scratch = self._delta_scratch.setdefault(
                nh, np.zeros((B, nh, self.imgsz, 3), np.int16)
            )
        act = staging[:, top : top + nh]
        d = np.subtract(act, self._prev_staging[:, top : top + nh],
                        dtype=np.int16, out=scratch)
        dmax = d.max(axis=(1, 2))  # (B, 3)
        dmin = d.min(axis=(1, 2))
        if int((dmax - dmin).max()) > 15:
            return None
        bias = np.clip(0, dmax - 7, dmin + 8).astype(np.int16)
        d -= bias[:, None, None, :]
        d += 8  # v = delta - bias + 8 in [0, 15] by construction
        v = d.reshape(-1)
        n_nib = v.size // 2
        payload = self._nibbuf[self._staging_i]
        np.bitwise_or(
            v[0::2].astype(np.uint8),
            np.left_shift(v[1::2], 4).astype(np.uint8),
            out=payload[:n_nib],
        )
        payload[n_nib : n_nib + self._n_bias] = (
            bias.reshape(-1) % 256
        ).astype(np.uint8)
        return payload[: n_nib + self._n_bias]

    def _letterbox_into(self, dst: np.ndarray, frame: np.ndarray, key=None):
        import cv2

        from manual_yolo_tpu.ops.letterbox import letterbox_params

        h, w = frame.shape[:2]
        r, nh, nw, top, left = letterbox_params((h, w), (self.imgsz, self.imgsz))
        # canvases are 114-filled once at construction and the resize only
        # writes the content region — if THIS slot buffer last held a
        # different geometry, stale pixels would survive in the new padding
        if key is not None:
            if self._slot_geom.get(key, (nh, nw)) != (nh, nw):
                dst[:] = 114
            self._slot_geom[key] = (nh, nw)
        if nw == self.imgsz:
            # odd-integer downscale (1920x1200 -> 640-canvas is exactly 3:1):
            # cv2 INTER_LINEAR degenerates to point sampling — the native
            # strided gather is byte-exact at ~1/4 the cost
            s = round(1 / r) if r > 0 else 0
            if not (
                s >= 3 and h == nh * s and w == nw * s
                and native.decimate_u8_into(frame, dst[top : top + nh], s)
            ):
                cv2.resize(frame, (nw, nh), dst=dst[top : top + nh],
                           interpolation=cv2.INTER_LINEAR)
        else:
            dst[top : top + nh, left : left + nw] = cv2.resize(
                frame, (nw, nh), interpolation=cv2.INTER_LINEAR
            )
        return r, (top, left), (nh, nw)

    def prewarm_async(self):
        """Dispatch the fixed program set ONCE on resident zero planes and
        return the (unfetched) outputs.

        Under ``PALLAS_AXON_REMOTE_COMPILE`` the terminal compiles each
        program at its first execution, and the client only blocks at a
        value fetch — measured (tools/overlap_probe.py): dispatching
        compute_fused + three more programs back to back costs one 54 s
        wait for the FIRST fetch and ~0.45 s for each later one, i.e. the
        terminal overlaps compile requests. Callers (bench, serve) invoke
        this right after construction so every fixed-program compile runs
        concurrently with host-side setup and with the lazily-discovered
        per-bucket decode compiles of the first warm batches, instead of
        serially inside them. Returns the outputs so a caller may fetch
        one element to block until the set is live."""
        outs = [
            self._compute_fused(
                self.det_params, self.cls_params, self._dev_prev,
                self._dev_pred_crops,
            ),
            self._classify(self.cls_params, self._dev_pred_crops),
        ]
        return outs

    def prewarm_buckets(self, spread: int = 1, deadline: float = None,
                        max_programs: int = 8):
        """Dispatch (unfetched) fused decode chains for payload-size
        buckets NEIGHBORING the ones the stream has already discovered.

        Every distinct (canvas bucket, crop bucket) pair is a program the
        TERMINAL compiles at its first execution per process — 30-300 s
        each on a degraded night — and the stream discovers buckets
        lazily as content evolves, i.e. potentially inside a measurement
        pass. Once the first fused batch reveals the operating point,
        dispatching the +-spread neighbors (and the raw-crop variant) on
        zero payloads lets the terminal compile them CONCURRENTLY during
        warmup (tools/overlap_probe.py) instead of serially at first
        use. Zero payloads decode to all-const segments, so the chains
        are harmless; stream state is not touched. Returns the unfetched
        outputs.

        Each dispatch ALSO costs a client lowering+compile (~1-10 s,
        serial on the caller), so the fan-out is bounded: at most
        ``max_programs`` dispatches and an optional absolute ``deadline``
        (time.perf_counter value) past which no further program goes
        out."""
        import jax.numpy as jnp

        outs = []
        for (top, nh, npc, npk) in list(self._fused_progs.keys()):
            bufs = self._segs_bufs.get(nh)
            cstep = bufs["step"] if bufs else None
            nseg = self.B * nh * (self.imgsz // self._segw)
            ctr = self.B * 3 + (nseg + 7) // 8 + (nseg + 1) // 2
            ns = self.B * self.max_rank
            nsegk = ns * 64
            ktr = ns * 3 + (nsegk + 7) // 8 + (nsegk + 1) // 2
            nk_raw = ns * 64 * 64 * 3
            npcs = (
                [npc + i * cstep for i in range(-spread, spread + 1)
                 if npc + i * cstep >= cstep]
                if cstep else [npc]
            )
            npks = {npk, -1}
            for c in npcs:
                for k in sorted(npks):
                    if len(outs) >= max_programs or (
                        deadline is not None
                        and time.perf_counter() > deadline
                    ):
                        return outs
                    if c == npc and k == npk:
                        continue  # already live
                    klen = nk_raw if k < 0 else k + ktr
                    payload = jnp.zeros((c + ctr + klen,), jnp.uint8)
                    fn = self._get_fused_prog(top, nh, c, k)
                    outs.append(
                        fn(self.det_params, self.cls_params, payload,
                           self._dev_prev, self._dev_pred_crops)
                    )
        return outs

    def submit_batch(self, frames: List[np.ndarray]) -> None:
        """Stage + dispatch one batch of exactly B frames (async).

        Aliasing contract: a frame array must NOT be mutated in place after
        submission — the stream keeps references across batches (delta
        references, crop gathers in the finisher thread). Submitting the
        *same array object* again in the same slot is the cheap way to say
        "unchanged" (cli/serve.py uses exactly this); a source that reuses
        one capture buffer must hand over a copy when the pixels change.
        Every in-repo capture source yields a fresh array per frame.
        """
        import jax.numpy as jnp

        assert len(frames) == self.B
        if self._delta_broken:
            # a previous batch failed after the host references advanced:
            # the device planes are stale — re-establish the chain raw
            self._delta_broken = False
            self._prev_staging = None
            self._prev_geom = None
            self._prev_frames = [None] * self.B
            self._pred_prev_crops = None
        _ts0 = time.perf_counter()
        self._staging_i = (self._staging_i + 1) % len(self._staging)
        staging = self._staging[self._staging_i]
        metas = []
        changed = [True] * self.B  # per-slot: staging differs from previous
        all_unchanged = self.delta and self._prev_staging is not None
        for i, f in enumerate(frames):
            # unchanged-frame fast path: a static capture slot re-sends the
            # same pixels — memcmp (~1 ms) + slot copy beats the ~4.6 ms
            # letterbox resize, and keeps staging byte-identical so the
            # skip/nibble encoder sees a zero delta
            pf = self._prev_frames[i] if self.delta else None
            if (
                pf is not None
                and self._prev_staging is not None
                and native.arrays_equal(pf, f)
            ):
                if staging is not self._prev_staging:
                    staging[i] = self._prev_staging[i]
                # this buffer slot no longer holds what it was last
                # letterboxed with -> force a padding clear next time
                self._slot_geom[(self._staging_i, i)] = "copied"
                metas.append(self._prev_metas[i])
                changed[i] = False
            else:
                metas.append(
                    self._letterbox_into(staging[i], f, (self._staging_i, i))
                )
                all_unchanged = False
            if self.delta:
                self._prev_frames[i] = f
        geom = self._batch_geom(metas)
        _ts1 = time.perf_counter()
        self.stage_stats["submit_letterbox"].append(_ts1 - _ts0)
        mode, payload, seg_bucket = "raw", None, None
        if self.delta and self._prev_staging is not None:
            if all_unchanged or native.arrays_equal(staging, self._prev_staging):
                mode = "skip"
            else:
                # active decodes touch only the content rows, so the
                # resident canvas's padding must already be 114 there — true
                # iff the previous batch shared this geometry
                if geom is not None and self._prev_geom == geom:
                    n_changed = sum(changed)
                    if 0 < n_changed <= self._slots_max:
                        # few slots changed (e.g. one table repainted in a
                        # multi-table fleet): upload ONLY those slots' active
                        # rows raw — K x 0.9 MB instead of a 24.5 MB full
                        # raw batch when one card flips
                        mode = "slots"
                    else:
                        # dense change: per-segment multi-class coding first
                        # (const segments are free, mixed jitter+repaint
                        # streams still encode); dense tribit (3/8 bytes)
                        # only when it would be byte-cheaper AND fits, then
                        # nibble (1/2 bytes)
                        seg_res = self._encode_segs(staging, *geom)
                        tribit_bytes = (
                            self.B * geom[1] * (self.imgsz * 3 * 3 // 8 + 3)
                        )
                        if seg_res is not None and len(seg_res[0]) > tribit_bytes:
                            tri = self._encode_tribit(staging, *geom)
                            if tri is not None:
                                seg_res, payload, mode = None, tri, "tribit"
                        if seg_res is not None:
                            payload, seg_bucket = seg_res
                            mode = "segs"
                        elif mode == "raw":
                            payload = self._encode_tribit(staging, *geom)
                            if payload is not None:
                                mode = "tribit"
                            else:
                                payload = self._encode_nibble(staging, *geom)
                                if payload is not None:
                                    mode = "nibble"
                else:
                    payload = self._encode_nibble(staging)
                    if payload is not None:
                        mode = "nibble"
        import threading

        _ts2 = time.perf_counter()
        self.stage_stats["submit_encode"].append(_ts2 - _ts1)
        item = {
            "frames": frames, "metas": metas, "fut": None, "mode": mode,
            # skip-mode with every slot byte-identical -> detect ran on the
            # SAME resident canvas and the crops come from identical frames,
            # so the whole tail's outputs are provably identical to the
            # previous batch's: the worker reuses them instead of re-fetching
            # and re-classifying (the detect program itself still executes)
            "memo": mode == "skip" and all_unchanged,
            "evt": threading.Event(), "out": None, "err": None,
        }
        if mode == "nibble":
            if geom is not None and self._prev_geom == geom:
                item["nibble_fn"] = self._get_active_progs(*geom)["nibble"]
            else:
                item["nibble_fn"] = self._detect_nibble
            item["payload"] = payload
        elif mode == "tribit":
            item["tribit_fn"] = self._get_active_progs(*geom)["tribit"]
            item["payload"] = payload
        elif mode == "segs":
            # predictive fused classify: crops gathered at the last
            # finished batch's rects ride in the SAME put, and detect +
            # classify run as ONE program -> 1 put + 1 fetch steady state
            _tc = time.perf_counter()
            payload, npk, pred = self._build_fused_payload(frames, payload)
            self.stage_stats["submit_crops"].append(time.perf_counter() - _tc)
            item["mode"] = "fused"
            item["fused_fn"] = self._get_fused_prog(*geom, seg_bucket, npk)
            item["payload"] = payload
            item["pred"] = pred
            self.crop_mode_counts["fused_segs" if npk >= 0 else "fused_raw"] += 1
        elif mode == "slots":
            idx = [i for i, c in enumerate(changed) if c]
            kp = 1
            while kp < len(idx):
                kp *= 2
            kp = min(kp, self.B)
            top, nh = geom
            pay = np.zeros((kp, nh, self.imgsz, 3), np.uint8)
            g = np.zeros(self.B, np.int32)
            mask = np.zeros(self.B, bool)
            for pos, b in enumerate(idx):
                pay[pos] = staging[b, top : top + nh]
                g[b] = pos
                mask[b] = True
            item["slots_fn"] = self._get_slots_prog(top, nh, kp)
            item["payload"] = pay.reshape(-1)
            item["g"] = g
            item["mask"] = mask
        elif mode == "raw":
            if geom is not None:
                item["raw_fn"] = self._get_active_progs(*geom)["raw"]
                item["mode"] = "raw_active"
                top, nh = geom
                item["act"] = np.ascontiguousarray(
                    staging[:, top : top + nh]
                ).reshape(-1)
            else:
                item["flat"] = staging.reshape(-1).copy()
        self.mode_counts[mode] += 1
        _pay = item.get("payload")
        if _pay is None:
            _pay = item.get("act", item.get("flat"))
        # bytes this batch actually sends over the link (0 for skip/memo
        # batches) — not a wall time; bench.py reads the deque directly
        self.stage_stats["payload_mb"].append(
            (_pay.nbytes if _pay is not None else 0) / 1e6
        )
        if self.delta:
            self._prev_staging = staging
            self._prev_metas = list(metas)
        if mode != "skip":
            self._prev_geom = geom
        self._pending.append(item)
        _ts3 = time.perf_counter()
        self._dispatch_q.put(item)  # blocks if 2 batches are undispatched
        self.stage_stats["submit_queue"].append(time.perf_counter() - _ts3)

    def collect_batch(self) -> List[List[Dict]]:
        """Return the oldest in-flight batch's results (finished by the
        worker thread; this just waits for it)."""
        item = self._pending.popleft()
        item["evt"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    @staticmethod
    def _rect_iou(a, b) -> float:
        """IoU of two (ys, xs, ye, xe) rects (host ints)."""
        iy = min(a[2], b[2]) - max(a[0], b[0])
        ix = min(a[3], b[3]) - max(a[1], b[1])
        if iy <= 0 or ix <= 0:
            return 0.0
        inter = iy * ix
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
        return inter / max(ua - inter, 1)

    @staticmethod
    def _gather_crop_u8(frame: np.ndarray, rect) -> Optional[np.ndarray]:
        """64x64 classifier crop at ``rect`` (shortest-side scale +
        center-crop, reference safe_crop semantics)."""
        import cv2

        ys, xs, ye, xe = rect
        crop = frame[ys:ye, xs:xe]
        if crop.size == 0:
            return None
        ch, cw = crop.shape[:2]
        s = 64 / min(ch, cw)
        nh, nw = max(64, round(ch * s)), max(64, round(cw * s))
        resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_LINEAR)
        t, l = (nh - 64) // 2, (nw - 64) // 2
        return resized[t : t + 64, l : l + 64]

    def _assemble_dets(self, frames, metas, packed):
        """Per-frame detection dicts + rank-crop candidates.

        Candidates carry hysteresis-stabilised rects and a deterministic
        slot order (class id, then rect): detector boxes jitter a few px
        frame to frame and NMS order swaps under photometric noise, which
        would otherwise make the slot-wise crop delta compare different
        cards / shifted content."""
        results: List[List[Dict]] = []
        all_cands: List[List[Tuple]] = []  # per frame: (cid, rect, det_i)
        p = self.crop_pad
        for bi in range(self.B):
            frame = frames[bi]
            r, (top, left), _ = metas[bi]
            n = int(packed[bi, 0, 6])
            h, w = frame.shape[:2]
            boxes = (packed[bi, :n, :4] - [left, top, left, top]) / r
            np.clip(boxes, 0, [w, h, w, h], out=boxes)
            dets = [
                {
                    "class_id": int(packed[bi, i, 5]),
                    "class_name": self.names.get(int(packed[bi, i, 5]), "?"),
                    "bbox": [int(v) for v in boxes[i]],
                    "conf": round(float(packed[bi, i, 4]), 3),
                    "ocr_text": "",
                }
                for i in range(n)
            ]
            results.append(dets)
            cands = []
            for i in range(n):
                cid = int(packed[bi, i, 5])
                if cid not in self._rank_ids:
                    continue
                x1, y1, x2, y2 = boxes[i]
                rect = self._stable_rect(
                    cid,
                    (max(0, int(y1) - p), max(0, int(x1) - p),
                     int(y2) + p, int(x2) + p),
                )
                cands.append((cid, rect, i))
            cands.sort(key=lambda c: c[:2])
            all_cands.append(cands[: self.max_rank])
        return results, all_cands

    def _apply_rank_prob(self, results, bi, di, prob_row) -> None:
        from manual_yolo_tpu.game.text import VALID_CARD_RANKS, normalize_rank_text

        if prob_row.dtype == np.uint8:  # u8 wire probabilities
            prob_row = prob_row.astype(np.float32) / 255.0
        t = int(np.argmax(prob_row))
        conf_t = float(prob_row[t])
        cname = results[bi][di]["class_name"]
        thr = 0.20 if ("turn" in cname or "river" in cname) else 0.40
        if conf_t >= thr:
            pred = self.rank_names.get(t, "")
            cleaned = normalize_rank_text(pred)
            results[bi][di]["ocr_text"] = (
                cleaned if cleaned in VALID_CARD_RANKS else pred.upper()
            )

    def _publish_pred_rects(self, all_cands) -> None:
        """Expose this batch's (class id, rect) slots to the submit thread
        as the next batches' crop predictions (atomic list swap).

        Pairs keep a short TTL: a borderline detection flickering out for
        a batch or two stays predicted, so its reappearance is a fused HIT
        instead of a miss round trip. Previous slot order is preserved for
        surviving pairs (keeps the crop-plane delta aligned); new pairs
        fill the tail up to max_rank. Near-duplicate pairs (same class id,
        rect IoU >= 0.6 — detector-box wobble variants of the SAME field)
        collapse to one slot: un-deduped they crowded the max_rank-capped
        list and pushed other fields out entirely, which showed up as
        hundreds of fused misses per batch (measured); the kept variant
        serves wobbled rects via near-miss acceptance in
        :meth:`_finish_batch_fused`."""
        out, ages_out = [], []
        for bi, cands in enumerate(all_cands):
            cur = [(cid, rect) for cid, rect, _ in cands]
            curset = set(cur)
            ages = self._pred_ages[bi]
            merged = []

            def near_dup(p):
                return any(
                    q[0] == p[0] and self._rect_iou(q[1], p[1]) >= 0.6
                    for q in merged
                )

            for p in self._pred_rects[bi]:
                if p in curset:
                    ages[p] = 0
                    if not near_dup(p):
                        merged.append(p)
                else:
                    a = ages.get(p, 0) + 1
                    if a <= 6:
                        ages[p] = a
                        if not near_dup(p):
                            merged.append(p)
            for p in cur:
                if p not in merged and not near_dup(p):
                    ages[p] = 0
                    merged.append(p)
            merged = merged[: self.max_rank]
            out.append(merged)
            ages_out.append({p: ages.get(p, 0) for p in merged})
        self._pred_rects = out
        self._pred_ages = ages_out

    def _unpack_dets(self, flat_u8, fut_full):
        """Host side of the u8 packed wire format: (B, readback_det, 12)
        u8 -> (B, n, 7) f32 in the classic packed layout. When any frame's
        capped count exceeds the readback bound, fetch the resident full
        f16 plane instead (one extra round trip, counted)."""
        arr = flat_u8[: self._nd_flat].reshape(self.B, self.readback_det, 12)
        cnt = arr[:, 0, 11]
        if fut_full is not None and (cnt > self.readback_det).any():
            self.readback_overflows += 1
            return (
                np.asarray(fut_full)
                .astype(np.float32)
                .reshape(self.B, self.max_det, 7)
            )
        u16 = (
            arr[:, :, :10]
            .copy()
            .view(np.uint16)
            .reshape(self.B, self.readback_det, 5)
            .astype(np.float32)
        )
        out = np.empty((self.B, self.readback_det, 7), np.float32)
        out[:, :, :4] = u16[:, :, :4] / 16.0
        out[:, :, 4] = u16[:, :, 4] / 65535.0
        out[:, :, 5] = arr[:, :, 10]
        out[:, :, 6] = cnt.astype(np.float32)[:, None]
        return out

    def _finish_batch(self, frames, metas, flat_np, fut_full=None):
        """Unpack the (prefetched) detect readback, gather rank crops,
        DISPATCH the classify (not awaited — the applier thread blocks on
        the probabilities and applies them, hiding the round trip like
        the fused path's miss fallback). Returns (results, probs_future,
        rows, pairs)."""
        t1 = time.perf_counter()
        # every mode returns packed|probs from the shared compute program;
        # the probs tail here came from stale/zero crops — sliced off
        packed = self._unpack_dets(flat_np, fut_full)
        results, all_cands = self._assemble_dets(frames, metas, packed)
        crops = np.zeros((self.B * self.max_rank, 64, 64, 3), np.uint8)
        crop_refs: List[Tuple[int, int]] = []  # (flat_slot, (frame_i, det_i))
        for bi, cands in enumerate(all_cands):
            for j, (cid, rect, i) in enumerate(cands):
                c = self._gather_crop_u8(frames[bi], rect)
                if c is None:
                    continue
                slot = bi * self.max_rank + j
                crops[slot] = c
                crop_refs.append((slot, (bi, i)))
        probs_fut = self._classify_crops(crops) if crop_refs else None
        self._publish_pred_rects(all_cands)
        self.stage_stats["finish_tail"].append(time.perf_counter() - t1)
        return results, probs_fut, self.B * self.max_rank, crop_refs

    def _finish_batch_fused(self, frames, metas, flat_np, pred,
                            fut_full=None):
        """Fused-mode tail, stage A: the (prefetched) readback carries the rank
        probabilities computed on the PREDICTED crops. Each actual
        detection whose stabilised rect matches its frame's prediction
        uses the fused probability row; the rest (new/moved cards — rare
        on static UI) are re-gathered and their classify DISPATCHED (not
        awaited — jax dispatch is async; the applier thread blocks on the
        result). Returns (results, probs_future, bucket, miss_refs)."""
        t1 = time.perf_counter()
        flat = flat_np  # u8 wire, materialised by the prefetch stage
        packed = self._unpack_dets(flat, fut_full)
        fused_probs = flat[self._nd_flat :].reshape(
            self.B * self.max_rank, -1
        )  # u8 rows; _apply_rank_prob rescales
        results, all_cands = self._assemble_dets(frames, metas, packed)
        miss_crops = None
        miss_refs: List[Tuple[int, int]] = []
        for bi, cands in enumerate(all_cands):
            slot_of = {cr: j for j, cr in enumerate(pred[bi])}
            for cid, rect, i in cands:
                j = slot_of.get((cid, rect))
                if j is None:
                    # near-miss acceptance: the taxonomy has exactly ONE
                    # field per class id (villian3_rank is a fixed seat
                    # position), so a same-class prediction whose rect
                    # substantially overlaps (IoU >= 0.6) IS the same
                    # card — the predicted crop was gathered from the
                    # CURRENT frame at a rect a few pixels off, the same
                    # slack the rect hysteresis already accepts. Detector
                    # boxes oscillate +-7-20 px under photometric jitter
                    # (measured), past the 6-px hysteresis, and every
                    # such wobble used to cost a fallback round trip
                    # (2 tunnel crossings). The centre bound keeps the
                    # classifier's effective content shift within 2x the
                    # crop pad.
                    for (pcid, prect), jj in slot_of.items():
                        if (
                            pcid == cid
                            and self._rect_iou(prect, rect) >= 0.6
                            and abs((prect[0] + prect[2])
                                    - (rect[0] + rect[2])) <= 4 * self.crop_pad
                            and abs((prect[1] + prect[3])
                                    - (rect[1] + rect[3])) <= 4 * self.crop_pad
                        ):
                            j = jj
                            break
                if j is not None and j < self.max_rank:
                    self.fused_hits += 1
                    self._apply_rank_prob(
                        results, bi, i, fused_probs[bi * self.max_rank + j]
                    )
                    continue
                self.fused_misses += 1
                c = self._gather_crop_u8(frames[bi], rect)
                if c is None:
                    continue
                if miss_crops is None:
                    miss_crops = np.zeros(
                        (self.B * self.max_rank, 64, 64, 3), np.uint8
                    )
                k = len(miss_refs)
                if k >= self.B * self.max_rank:
                    break
                miss_crops[k] = c
                miss_refs.append((bi, i))
        probs_fut, ns = None, 0
        if miss_refs:
            self.fallback_batches += 1
            import jax.numpy as jnp

            if len(miss_refs) <= 32:
                # steady-state misses are a handful per batch; moderate
                # churn lands in the tens. Power-of-2 buckets (8, 32) keep
                # the fallback upload tiny on the weak link — 9+ misses
                # previously fell straight to the full ~6 MB plane
                # (100-400 ms on a 16-70 MB/s link; advisor r3)
                ns = 8 if len(miss_refs) <= 8 else 32
                probs_fut = self._get_classify_small(ns)(
                    self.cls_params, jnp.asarray(miss_crops[:ns].reshape(-1))
                )
            else:
                # bootstrap / churn floods (every rect new): classify the
                # full miss plane with the standalone program — the ~6 MB
                # upload only happens on warmup-grade batches
                ns = self.B * self.max_rank
                probs_fut = self._classify(
                    self.cls_params, jnp.asarray(miss_crops.reshape(-1))
                )
        self._publish_pred_rects(all_cands)
        self.stage_stats["finish_tail"].append(time.perf_counter() - t1)
        return results, probs_fut, ns, list(enumerate(miss_refs))

    def _stable_rect(self, cid: int, rect: Tuple[int, int, int, int]):
        """Hysteresis for crop rects: when a new rect is within the pad
        margin of a recently used one for the same class, reuse the cached
        rect verbatim. On static content (table UI) this makes the gathered
        crop bytes temporally stable — the crop-plane delta collapses to
        const-class segments / skips — and the classifier input
        deterministic; the pad margin bounds the content shift. Per-class
        lists (MRU, capped) keep multi-table slots with the same class
        apart by proximity."""
        cache = self._rect_cache.setdefault(cid, [])
        tol = self.crop_pad
        for k, r in enumerate(cache):
            if (abs(r[0] - rect[0]) <= tol and abs(r[1] - rect[1]) <= tol
                    and abs(r[2] - rect[2]) <= tol
                    and abs(r[3] - rect[3]) <= tol):
                if k:
                    cache.insert(0, cache.pop(k))
                return r
        cache.insert(0, rect)
        del cache[8:]
        return rect

    def _classify_crops(self, crops: np.ndarray):
        """Classify the gathered rank crops, streaming the crop plane as a
        DELTA against the previous batch's (worker thread only — the chain
        is sequential by construction): skip when byte-identical, segs
        payload when the encoding wins, raw otherwise. Lossless; the
        classifier sees bit-identical crops in every mode."""
        import jax.numpy as jnp

        flat = crops.reshape(-1)
        if self.delta and self._prev_crops is not None:
            if native.arrays_equal(crops, self._prev_crops):
                self.crop_mode_counts["skip"] += 1
                # byte-identical crops + fixed params -> identical probs:
                # reuse the previous classify's device array outright
                # (worker thread is the only caller, so the cached ref
                # always corresponds to _prev_crops)
                if self._dev_last_cls_probs is not None:
                    return self._dev_last_cls_probs
                probs = self._classify(self.cls_params, self._dev_prev_crops)
                self._dev_last_cls_probs = probs
                return probs
            enc = self._encode_crop_segs(crops)
            if enc is not None:
                payload, npb = enc
                self.crop_mode_counts["segs"] += 1
                probs, dev_crops = self._get_classify_segs_prog(npb)(
                    self.cls_params, jnp.asarray(payload), self._dev_prev_crops
                )
                self._dev_prev_crops = dev_crops
                # crops is freshly allocated per batch and never mutated
                # after classification -> safe to keep by reference
                self._prev_crops = crops
                self._dev_last_cls_probs = probs
                return probs
        self.crop_mode_counts["raw"] += 1
        dev_crops = jnp.asarray(flat)
        probs = self._classify(self.cls_params, dev_crops)
        if self.delta:
            self._dev_prev_crops = dev_crops
            self._prev_crops = crops
            self._dev_last_cls_probs = probs
        return probs

    def stage_summary(self, skip: int = 0) -> Dict[str, Dict[str, float]]:
        """Per-stage wall-time summary in ms (mean/p50/max over recorded
        batches, optionally skipping the first ``skip`` warmup entries)."""
        out = {}
        for k, v in self.stage_stats.items():
            # bytes / count diagnostics, not wall times — read directly
            if k in ("payload_mb", "canvas_mb", "crops_mb",
                     "canvas_seg_counts"):
                continue
            lv = list(v)
            vs = sorted(lv[skip:] if len(lv) > skip else lv)
            if not vs:
                continue
            out[k] = {
                "mean_ms": round(1e3 * sum(vs) / len(vs), 2),
                "p50_ms": round(1e3 * vs[len(vs) // 2], 2),
                "max_ms": round(1e3 * vs[-1], 2),
                "n": len(vs),
            }
        return out

    def reset_stage_stats(self) -> None:
        self.stage_stats.clear()

    @property
    def in_flight(self) -> int:
        return len(self._pending)

    def close(self) -> None:
        """Stop the dispatcher/finisher threads (idempotent). Pending
        batches should be collected first; uncollected ones are dropped."""
        if getattr(self, "_closed", False):
            return
        self._closed = True
        # one sentinel, forwarded down the chain (dispatcher -> worker ->
        # applier) so it can never overtake an in-flight batch
        self._dispatch_q.put(None)
        self._dispatch_thread.join(timeout=5)
        self._worker_thread.join(timeout=5)
        self._applier_thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_streaming_engine(
    detector_weights: str, classifier_weights: str, **kwargs
) -> StreamingEngine:
    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.models.classifier import RankClassifier

    det_params, det_meta = load_params(detector_weights)
    sp = det_meta.get("spec", {})
    det_spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    det_params = yolov8.fold_params(det_params, det_spec)
    names = {int(k): v for k, v in det_meta.get("names", {}).items()} or taxonomy.CLASSES
    if classifier_weights.endswith(".pt"):
        clf = RankClassifier.from_torch_checkpoint(classifier_weights)
    else:
        clf = RankClassifier.from_npz(classifier_weights)
    return StreamingEngine(
        det_params=det_params, det_spec=det_spec,
        cls_params=clf.params, cls_spec=clf.spec,
        names=names, rank_names=clf.names, **kwargs,
    )


def load_batch_stream(
    detector_weights: str, classifier_weights: str, **kwargs
) -> BatchStream:
    from manual_yolo_tpu.core.serialization import load_params
    from manual_yolo_tpu.models import yolov8
    from manual_yolo_tpu.models.classifier import RankClassifier

    det_params, det_meta = load_params(detector_weights)
    sp = det_meta.get("spec", {})
    det_spec = yolov8.build_spec("detect", sp.get("scale", "n"), int(sp.get("nc", 64)))
    det_params = yolov8.fold_params(det_params, det_spec)
    names = {int(k): v for k, v in det_meta.get("names", {}).items()} or taxonomy.CLASSES
    if classifier_weights.endswith(".pt"):
        clf = RankClassifier.from_torch_checkpoint(classifier_weights)
    else:
        clf = RankClassifier.from_npz(classifier_weights)
    return BatchStream(
        det_params=det_params, det_spec=det_spec,
        cls_params=clf.params, cls_spec=clf.spec,
        names=names, rank_names=clf.names, **kwargs,
    )

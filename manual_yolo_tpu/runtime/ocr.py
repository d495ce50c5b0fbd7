"""OCR engine: on-device preprocessing cascade + CRNN + allowlist CTC decode.

Replaces the vendored EasyOCR usage across all three reference pipelines:
  * multi-pass policy of ``detect.py:180-229`` — pass 1 enhanced, pass 2
    Otsu, pass 3 2x upscale, keep the highest-confidence reading, gate at
    0.35 (0.15 for turn/river);
  * per-field allowlists + regex validation of ``yolo.py:218-315``.

TPU-first shape: the reference runs the passes SERIALLY, re-entering the
OCR engine until confidence is high enough. Here all passes are batched
into ONE recognizer call (variants are device-preprocessed, stacked, and
decoded together; best confidence selected on device) — SURVEY.md hard
part (f).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.game import taxonomy
from manual_yolo_tpu.game.text import (
    extract_card_value,
    extract_name,
    extract_numeric_value,
    normalize_rank_text,
)
from manual_yolo_tpu.models import crnn
from manual_yolo_tpu.ops import ctc as ctc_ops
from manual_yolo_tpu.ops import image as img_ops

NUMERIC_ALLOW = "0123456789.,kKmMbBlL$"  # L = lakh (the UI shows "4.55L")
# reference allowlist (yolo.py:305) + interior "."/"-": real usernames show
# them ("s.kaahyap") and the reference's own regex could never read those
NAME_ALLOW = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.-"
)
# the reference's exact name allowlist — decoded ALONGSIDE the extended one
# (same logits, two masks) so a spurious dot/dash never costs a read the
# extended charset would otherwise lose ("moneyball49." fails validation;
# the strict decode recovers "moneyball49")
STRICT_NAME_ALLOW = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)
CARD_ALLOW = "AKQJT2345678910SHDCshdc"
# game ids are alnum/underscore — no dot/dash (those would corrupt the
# digit runs of "Game ID : 232025507")
GAME_ID_ALLOW = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


def field_kind(class_name: str) -> str:
    """Map a detection class to its OCR field kind (yolo.py:173-190)."""
    low = class_name.lower()
    if low.endswith("_rank"):
        return "card"
    if low == "game_id":
        return "game_id"
    if low.endswith("_bet") or low.endswith("_stack") or low in (
        "my_bet", "my_stack", "total_pot", "iinput_field"
    ):
        return "numeric"
    if low.endswith("_name"):
        return "name"
    return "generic"


class OCREngine:
    """CRNN-backed OCR with the reference's multi-pass confidence policy."""

    # enhanced / otsu / raw / deskewed — the detect.py passes plus the
    # pipe.py:249-261 deskew chain, all batched into one recognizer call
    N_VARIANTS = 4

    # default vision-LLM failure gates per kind (see ``self.llm_gate``):
    # calibrated by the round-5 threshold sweep on the data/ocr_real
    # holdout (cli/eval_ocr.py --sweep-gates; table + rationale in
    # docs/PARITY.md). game_id: the holdout's one wrong id read at 0.9675
    # while every correct one read >= 0.9731 — 0.97 catches it at zero
    # correct-read cost. The catastrophic length-collapse failure class
    # reads at HIGH confidence and is caught by the collapse detector
    # below, not the gate.
    LLM_GATE = {"name": 0.97, "game_id": 0.97, "numeric": 0.97,
                "card": 0.0, "generic": 0.0}
    # collapse detector (name/game_id): a validated read dramatically
    # shorter than the crop width supports (expected glyphs ~ (w/h)/0.55)
    # is the catastrophic-misread signature — the holdout's
    # SolemnInflux->"ru" collapse WON at confidence 0.989 (raw confidence
    # is uncalibrated for this failure class; measured, docs/PARITY.md),
    # but its length ratio 0.24 sits far below correct reads' p5 of 0.36.
    # Reads under the floor get their confidence demoted below every gate
    # so the LLM tier always sees them.
    COLLAPSE_FLOOR = 0.30
    COLLAPSE_KINDS = ("name", "game_id")

    def __init__(self, params, width: int = 256, compute_dtype=jnp.float32,
                 text_detector_params=None, img_h: int = 32):
        # a list/tuple of param trees = seed ENSEMBLE: every model's logits
        # are decoded with every mask/variant and all candidates compete on
        # (per-model-calibrated) confidence — one fused device call.
        # Members may also differ in GEOMETRY (width/img_h): from_npz groups
        # them and appends the extra groups via _add_group; each geometry
        # group is its own device call and all candidates compete on host.
        self.compute_dtype = compute_dtype
        self._groups: List = []
        self._add_group(
            list(params) if isinstance(params, (list, tuple)) else [params],
            width, img_h,
        )
        # primary-group geometry (back-compat for callers reading .width)
        self.width = width
        self.params = self._groups[0].params
        self._n_models = self._groups[0].n_models
        # per kind: a (M, C) STACK of allowlist masks; every mask decodes the
        # same recognizer logits and all M x N_VARIANTS candidates compete
        self._masks = {
            "numeric": jnp.asarray(
                ctc_ops.allowlist_mask(NUMERIC_ALLOW)[None]
            ),
            "name": jnp.asarray(
                np.stack([
                    ctc_ops.allowlist_mask(NAME_ALLOW),
                    ctc_ops.allowlist_mask(STRICT_NAME_ALLOW),
                ])
            ),
            "card": jnp.asarray(ctc_ops.allowlist_mask(CARD_ALLOW)[None]),
            "game_id": jnp.asarray(
                ctc_ops.allowlist_mask(GAME_ID_ALLOW)[None]
            ),
            "generic": jnp.asarray(ctc_ops.allowlist_mask(None)[None]),
        }
        # Pad every kind's mask stack to the SAME M (repeating the primary
        # mask): the recognizer programs are keyed by input shapes, and a
        # per-kind M would compile one program per (group, entry, kind) —
        # ~10 programs instead of 4. Under the remote-compile tunnel each
        # fresh process pays a terminal-side compile per program
        # (tools/firstexec_probe.py — no cross-process cache exists), so
        # the program count is cold-start wall time. A duplicated mask
        # yields duplicated candidates, which the host-side dedup already
        # drops; masks[0] stays the primary, preserving scoring semantics.
        _m_max = max(int(v.shape[0]) for v in self._masks.values())
        self._masks = {
            k: (
                v
                if int(v.shape[0]) == _m_max
                else jnp.concatenate(
                    [v] + [v[:1]] * (_m_max - int(v.shape[0]))
                )
            )
            for k, v in self._masks.items()
        }
        # host prefix-beam + ensemble-rescore refinement: per-model beams
        # recover doubled/narrow characters greedy decode collapses
        # ("snowsport55" -> "snowsport5" was the dominant real-crop error
        # class), and the ensemble-summed CTC forward score re-ranks the
        # pool. Candidates then compete in the same validated-candidates
        # policy; costs ~25 ms/crop on host — OCR runs only on changed
        # fields, and self.beam = False turns it off.
        self.beam = True
        self.beam_width = 8
        # read_fields escalation policy, PER KIND: crops are decoded greedy
        # first and only the ones whose winning greedy candidate failed
        # validation OR won with confidence below the kind's threshold pay
        # the beam pass (whose real cost on a tunnelled TPU is fetching the
        # (K, T, C) log-probs for rescoring, ~0.2 MB/crop — the C++ decode
        # itself is ~0.3 ms/crop). Calibrated on data/ocr_real
        # (cli/eval_ocr.py --escalate): confidence-gating numeric reads
        # costs 0.980 -> 0.974 while halving their beam traffic, but
        # game_id collapses 0.857 -> 0.571 and name 0.907 -> 0.872 — so the
        # rare kinds always beam (>= 1.01 threshold) and only the hot
        # numeric kind gates.
        self.beam_escalate_conf = {"numeric": 0.90}
        # vision-LLM failure gate, PER KIND: an important field whose local
        # read wins with confidence BELOW the kind's gate is flagged for
        # the LLM tier even though a validated text exists — the cascade's
        # safety property (reference detect.py:186-189,226 escalates on
        # confidence at every tier; yolo.py:629-747 LLM tier). Values from
        # the round-5 calibration sweep on the data/ocr_real holdout
        # (cli/eval_ocr.py --sweep-gates; table in docs/PARITY.md): the
        # known catastrophic name misread reads at low confidence while
        # nearly all correct reads sit far above these gates.
        self.llm_gate = dict(self.LLM_GATE)
        # optional CRAFT text detector (the EasyOCR detection stage): enables
        # read_region() on multi-line / loose crops
        self._craft_params = text_detector_params
        self._craft_fwd = None
        if text_detector_params is not None:
            from manual_yolo_tpu.models import craft as craft_mod

            self._craft_fwd = jax.jit(
                lambda p, x: craft_mod.forward(p, x, jnp.float32)
            )

    def _add_group(self, trees: List, width: int, img_h: int,
                   kinds=None) -> None:
        """Register a geometry group: a stack of same-shape param trees that
        share an input canvas (img_h, width). Each group compiles its own
        recognizer call; candidates from every group compete on host.

        ``kinds`` (None = all) restricts the group to specific field kinds:
        the 64-px high-resolution member fixes narrow-glyph name confusions
        but its 2x-scaled lead-in truncates leading digits on short numeric
        crops ('1.48L' -> '.48L' on real holdout), so it ships gated to
        name+game_id and never sees numeric fields."""
        from types import SimpleNamespace

        n_models = len(trees)
        params = (
            trees[0]
            if n_models == 1
            else jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees
            )
        )
        g = SimpleNamespace(params=params, n_models=n_models, width=width,
                            img_h=img_h,
                            kinds=frozenset(kinds) if kinds else None)
        g.run = jax.jit(partial(self._run_impl, n_models=n_models))
        g.run_logp = jax.jit(partial(self._run_logp_impl, n_models=n_models))
        self._groups.append(g)

    def _groups_for(self, kind: str) -> List:
        """Groups competing for this field kind (kind-gated members sit
        out); falls back to every group if the gating excluded them all."""
        gs = [g for g in self._groups if g.kinds is None or kind in g.kinds]
        return gs or self._groups

    def prewarm_async(self, kinds=("numeric", "name", "game_id"),
                      buckets=None):
        """Dispatch each (group, kind, bucket) recognizer program once on
        a zero batch, WITHOUT fetching, and return the unfetched outputs.

        Under the remote-compile tunnel the terminal compiles a program at
        its first execution and overlaps concurrent requests
        (tools/overlap_probe.py) — so a streaming caller (bench, serve)
        dispatches all recognizer compiles up front, concurrently with the
        detector's own big compile, instead of paying each one serially at
        the first changed-field read (~10-40 s apiece mid-measurement).
        Both the greedy (``run``) and beam (``run_logp``) entry points are
        warmed: the escalation path uses the latter.

        ``buckets``: batch-size buckets to warm; default is the single
        production bucket implied by MIN_BUCKET/MAX_CHUNK (right for
        callers that pin MIN_BUCKET = MAX_CHUNK, like bench). Callers with
        variable read counts pass the power-of-two buckets they expect."""
        outs = []
        if buckets is None:
            buckets = (min(self.MAX_CHUNK, max(self.MIN_BUCKET, 1)),)
        for kind in kinds:
            masks = self._masks[kind]
            for g in self._groups_for(kind):
                for b in buckets:
                    zeros = jnp.zeros((b, g.img_h, g.width), jnp.float32)
                    outs.append(g.run(g.params, zeros, masks))
                    outs.append(g.run_logp(g.params, zeros, masks))
        return outs

    @classmethod
    def from_npz(cls, path, compute_dtype=jnp.float32,
                 text_detector: Optional[str] = None) -> "OCREngine":
        """``path``: one npz path, or a list/comma-separated string of
        paths -> seed ensemble. Members whose (width, img_h) geometry
        differs (e.g. the 64-px high-resolution member) land in their own
        group; all groups' candidates compete at decode time. A member
        whose meta carries ``kinds`` (comma-separated field kinds) only
        competes for those kinds (see _add_group)."""
        from manual_yolo_tpu.core.serialization import load_params

        paths = (
            [p for p in path.split(",") if p]
            if isinstance(path, str)
            else list(path)
        )
        by_geom: Dict[Tuple[int, int, Any], List] = {}
        order: List[Tuple[int, int, Any]] = []
        for p in paths:
            params, meta = load_params(p)
            kinds = meta.get("kinds") or None
            if isinstance(kinds, str):
                kinds = tuple(sorted(k for k in kinds.split(",") if k))
            geom = (int(meta.get("width", 256)), int(meta.get("img_h", 32)),
                    kinds)
            if geom not in by_geom:
                by_geom[geom] = []
                order.append(geom)
            by_geom[geom].append(jax.tree_util.tree_map(jnp.asarray, params))
        td = None
        if text_detector:
            import os

            from manual_yolo_tpu.core.serialization import resolve_weight_path

            text_detector = resolve_weight_path(text_detector)
            if os.path.exists(text_detector):
                from manual_yolo_tpu.models import craft as craft_mod

                td = craft_mod.load_npz(text_detector)
        (w0, h0, k0), rest = order[0], order[1:]
        eng = cls(by_geom[(w0, h0, k0)], width=w0, img_h=h0,
                  compute_dtype=compute_dtype, text_detector_params=td)
        if k0:
            eng._groups[0].kinds = frozenset(k0)
        for geom in rest:
            eng._add_group(by_geom[geom], geom[0], geom[1], kinds=geom[2])
        return eng

    # -- device program ----------------------------------------------------

    def _variants(self, gray: jnp.ndarray) -> jnp.ndarray:
        """(32, W) -> (4, 32, W, 1): enhanced / otsu / identity / deskewed."""
        enhanced = img_ops.clahe(gray, clip_limit=2.0)
        otsu = img_ops.otsu_binarize(gray)
        deskewed = img_ops.clahe(img_ops.deskew(gray), clip_limit=2.0)
        return jnp.stack([enhanced, otsu, gray, deskewed])[..., None]

    def _run_parts(self, params, gray_batch, masks, n_models):
        """gray_batch (N, H, W), masks (M, C);
        returns (ids (N, K*M*V, T), conf (N, K*M*V), logits (K, N*V, T, C))
        — K model forwards (K = group ensemble size), M allowlist decodes of
        each model's logits."""
        var = jax.vmap(self._variants)(gray_batch)  # (N, V, H, W, 1)
        n, v, h, w, c = var.shape
        flat = var.reshape(n * v, h, w, c)
        if n_models > 1:
            logits = jax.vmap(
                lambda p: crnn.forward(p, flat, self.compute_dtype)
            )(params)  # (K, N*V, T, C)
        else:
            logits = crnn.forward(params, flat, self.compute_dtype)[None]

        def decode_model(lg):
            # score every mask's decode under the PRIMARY mask's softmax so
            # confidences are comparable across masks (a narrower allowlist
            # renormalises over fewer chars and would inflate its own score)
            return jax.vmap(
                lambda m: ctc_ops.greedy_decode(lg, m, score_mask=masks[0])
            )(masks)

        ids, conf = jax.vmap(decode_model)(logits)  # (K, M, N*V, T/-)
        k, m = logits.shape[0], masks.shape[0]
        ids = (
            ids.reshape(k * m, n, v, -1).transpose(1, 0, 2, 3).reshape(n, k * m * v, -1)
        )
        conf = conf.reshape(k * m, n, v).transpose(1, 0, 2).reshape(n, k * m * v)
        return ids, conf, logits

    def _run_impl(self, params, gray_batch, masks, n_models=1):
        ids, conf, _ = self._run_parts(params, gray_batch, masks, n_models)
        return ids, conf

    def _run_logp_impl(self, params, gray_batch, masks, n_models=1):
        """_run_impl + EVERY group model's masked log-probs at each
        crop's winning (mask, variant): (N, K, T, C), for the host
        prefix-beam + ensemble-rescore refinement. The winning flat index j
        over (K*M*V) unravels as km = j // V (with m = km % M) and
        v = j % V — the exact reshape order of :meth:`_run_parts`."""
        ids, conf, logits = self._run_parts(params, gray_batch, masks, n_models)
        n = gray_batch.shape[0]
        v = self.N_VARIANTS
        j = jnp.argmax(conf, axis=1)  # (N,)
        vv = j % v
        sel = logits[:, jnp.arange(n) * v + vv]  # (K, N, T, C)
        # rescore under the PRIMARY mask, not the winning decode's mask:
        # masks[0] is the widest allowlist of the kind (NAME_ALLOW ⊃
        # STRICT_NAME_ALLOW), and the ensemble rescorer SUMS these scores
        # across groups — a narrower winning mask would hard-veto (-inf)
        # any candidate using a char outside it (measured: every
        # 's.kaahyap' real crop lost its dot because one group's winner
        # was the strict dot-less mask, 25/42 of the r4 train-split
        # errors). Masks shape candidate GENERATION; arbitration must
        # measure image evidence under one shared charset — the same
        # masks[0] the greedy confidences already score under.
        logp = jax.nn.log_softmax(
            sel + masks[0][None, None, None, :], axis=-1
        )
        return ids, conf, jnp.transpose(logp, (1, 0, 2, 3))

    # batch-size bucketing: each distinct leading dim N would otherwise
    # compile its own XLA program (remote compiles cost 20-40 s through the
    # tunnel). Calls are chunked to at most MAX_CHUNK crops and padded up to
    # the next power of two (at least MIN_BUCKET — streaming callers raise
    # it to shrink the program set further), so the compiled-program set is
    # small and fixed regardless of how many fields a frame/batch produces.
    MAX_CHUNK = 128
    MIN_BUCKET = 1

    def _run_bucketed(self, fn, params, batch: jnp.ndarray, masks):
        """Apply ``fn(params, chunk, masks)`` over bucketed chunks of
        ``batch`` (leading dim) and concatenate the per-crop outputs. Pad
        lanes are zero images; their outputs are sliced away (every output's
        dim 0 is the crop axis)."""
        n = batch.shape[0]
        parts: List[Tuple] = []
        for s in range(0, n, self.MAX_CHUNK):
            chunk = batch[s:s + self.MAX_CHUNK]
            m = chunk.shape[0]
            b = min(self.MAX_CHUNK, max(self.MIN_BUCKET, 1))
            while b < m:
                b *= 2
            if b > m:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((b - m,) + chunk.shape[1:],
                                      chunk.dtype)]
                )
            res = fn(params, chunk, masks)
            if not isinstance(res, tuple):
                res = (res,)
            parts.append(tuple(np.asarray(r)[:m] for r in jax.device_get(res)))
        return tuple(
            np.concatenate([p[i] for p in parts]) for i in range(len(parts[0]))
        )

    # -- host API ----------------------------------------------------------

    @staticmethod
    def _kind_pad(kind: str):
        """Per-kind lateral background pad for preprocess_gray. game_id
        crops are long and edge-tight ('| Game ID : 232027866'): a wider
        blank lead-in measurably recovers dropped edge digits (valid-split
        game_id 0.89 -> 0.96), while short fields LOSE from the same pad —
        so it is applied per kind, not globally."""
        if kind == "game_id":
            return lambda h: max(4, h // 4)
        return lambda h: None  # preprocess default (h // 8)

    def read_batch(
        self, crops_gray: List[np.ndarray], kind: str = "generic",
        min_confidence: float = 0.35,
    ) -> List[Tuple[str, float]]:
        """Batch of variable-size gray crops -> [(text, confidence)].

        All crops and all preprocessing variants go through the recognizer
        in one device call; per crop the highest-confidence variant wins
        (multi-pass policy of detect.py:194-226, parallelised).
        """
        if not crops_gray:
            return []
        best: List[Tuple[str, float]] = [("", -1.0)] * len(crops_gray)
        for g in self._groups_for(kind):
            ids, conf = self._run_bucketed(
                g.run, g.params, self._pre_batch(g, crops_gray, kind),
                self._masks[kind],
            )
            for i in range(len(crops_gray)):
                j = int(np.argmax(conf[i]))
                c = float(conf[i, j])
                if c > best[i][1]:
                    best[i] = (ctc_ops.decode_to_text(ids[i, j]), c)
        return [
            (t, c) if c >= min_confidence else ("", c) for t, c in best
        ]

    def _pre_batch(self, group, crops_gray, kind: str) -> jnp.ndarray:
        """Stack variable-size gray crops onto a group's input canvas."""
        kpad = self._kind_pad(kind)
        return jnp.asarray(
            np.stack(
                [
                    crnn.preprocess_gray(
                        c, group.width, pad=kpad(c.shape[0]),
                        img_h=group.img_h,
                    )
                    for c in crops_gray
                ]
            )
        )

    def read_batch_candidates(
        self, crops_gray: List[np.ndarray], kind: str = "generic",
        beam: Optional[bool] = None,
    ) -> List[List[Tuple[str, float]]]:
        """Like :meth:`read_batch` but returns ALL decode candidates per
        crop (every preprocessing variant x every allowlist mask), sorted
        confidence-descending and deduplicated by text. Callers pick the
        first candidate that passes field validation — a high-confidence
        read that fails the field regex no longer costs the whole field.

        With ``beam``, each ensemble model's winning-variant log-probs are
        prefix-beam searched on host (summing path mass per prefix recovers
        the doubled/narrow characters greedy's single-best-path decode
        collapses — the dominant real-crop error class), the candidate pool
        (beams + greedy texts) is RESCORED by the ensemble-summed CTC
        forward score, and candidates are emitted in that order. Measured
        on held-out real crops: 0.924 -> 0.948 exact-match."""
        if not crops_gray:
            return []
        if beam is None:
            beam = self.beam
        n = len(crops_gray)
        # one device call per geometry group; every group's decodes (and, in
        # beam mode, every group's winning-variant log-probs) are pooled and
        # compete on host
        groups = self._groups_for(kind)
        g_ids, g_conf, g_logps = [], [], []
        for g in groups:
            batch = self._pre_batch(g, crops_gray, kind)
            if beam:
                ids, conf, logps = self._run_bucketed(
                    g.run_logp, g.params, batch, self._masks[kind]
                )
                g_logps.append(logps)
            else:
                ids, conf = self._run_bucketed(
                    g.run, g.params, batch, self._masks[kind]
                )
            g_ids.append(ids)
            g_conf.append(conf)
        out = []
        for i in range(n):
            # global candidate order across groups, confidence-descending;
            # stable: on ties the primary group's primary mask comes first
            flat = [
                (gi, j)
                for gi in range(len(groups))
                for j in range(g_conf[gi].shape[1])
            ]
            flat.sort(key=lambda t: -float(g_conf[t[0]][i, t[1]]))
            cands: List[Tuple[str, float]] = []
            seen = set()
            if beam:
                best_conf = float(g_conf[flat[0][0]][i, flat[0][1]])
                pool = {}
                for lp in g_logps:
                    for k in range(lp.shape[1]):
                        for pfx, _ in ctc_ops.prefix_beam_decode(
                            lp[i, k], beam_width=self.beam_width
                        ):
                            pool.setdefault(pfx)
                for gi, j in flat:
                    pool.setdefault(
                        tuple(int(x) for x in g_ids[gi][i, j] if x > 0)
                    )
                pool_list = list(pool)
                totals = np.zeros(len(pool_list), np.float64)
                for lp in g_logps:
                    for k in range(lp.shape[1]):
                        totals += ctc_ops.score_candidates(lp[i, k], pool_list)
                order = sorted(
                    range(len(pool_list)),
                    key=lambda j: (-totals[j], pool_list[j]),
                )
                for oi in order:
                    pfx = pool_list[oi]
                    text = "".join(crnn.CHARSET[c - 1] for c in pfx)
                    if text not in seen:
                        seen.add(text)
                        cands.append((text, best_conf))
            for gi, j in flat:
                text = ctc_ops.decode_to_text(g_ids[gi][i, j])
                if text in seen:
                    continue
                seen.add(text)
                cands.append((text, float(g_conf[gi][i, j])))
            out.append(cands)
        return out

    @staticmethod
    def _to_gray(crop_bgr: np.ndarray) -> np.ndarray:
        if crop_bgr.ndim == 3:
            return np.asarray(
                0.114 * crop_bgr[..., 0] + 0.587 * crop_bgr[..., 1]
                + 0.299 * crop_bgr[..., 2],
                np.float32,
            ) / 255.0
        return crop_bgr.astype(np.float32) / 255.0

    @staticmethod
    def _validate(kind: str, class_name_low: str, text: str) -> Optional[str]:
        """Per-kind validation/normalisation (reference yolo.py:218-315)."""
        if kind == "card":
            if class_name_low.endswith("_rank"):
                return normalize_rank_text(text) or None
            return extract_card_value(text)
        if kind == "numeric":
            return extract_numeric_value(text)
        if kind == "name":
            return extract_name(text)
        if kind == "game_id":
            # the crop reads "| Game ID : <digits>"; the id is the digit run
            import re

            m = re.findall(r"\d{6,}", text)
            if m:
                return m[-1]
            return extract_name(text)
        return text or None

    @staticmethod
    def _field_threshold(class_name_low: str, min_confidence: float) -> float:
        if "turn" in class_name_low or "river" in class_name_low:
            return min(min_confidence, 0.15)  # detect.py:187
        return min_confidence

    def read_field(
        self, crop_bgr: np.ndarray, class_name: str,
        min_confidence: float = 0.35,
    ) -> Optional[str]:
        """Reference-parity single-field read with validation/normalisation."""
        if crop_bgr is None or crop_bgr.size == 0:
            return None
        kind = field_kind(class_name)
        gray = self._to_gray(crop_bgr)
        low = class_name.lower()
        cands, = self.read_batch_candidates([gray], kind)
        return self._pick_validated(
            kind, low, cands, self._field_threshold(low, min_confidence)
        )

    @classmethod
    def _pick_validated(
        cls, kind: str, low: str, cands: List[Tuple[str, float]], thr: float
    ) -> Optional[str]:
        """First candidate (confidence-descending) above threshold that
        passes per-kind validation (reference behavior = best-only; the
        fall-through only ever recovers fields the reference would drop)."""
        return cls._pick_validated_conf(kind, low, cands, thr)[0]

    @classmethod
    def _pick_validated_conf(
        cls, kind: str, low: str, cands: List[Tuple[str, float]], thr: float
    ) -> Tuple[Optional[str], float]:
        """:meth:`_pick_validated` plus the winning candidate's confidence
        (-1.0 when nothing validated) — the escalation signal for
        :meth:`read_fields`' greedy-then-beam policy."""
        for text, conf in cands:
            if conf < thr:
                return None, -1.0
            v = cls._validate(kind, low, text)
            if v:
                return v, conf
        return None, -1.0

    # make the engine itself usable where a read_field callable is expected
    __call__ = read_field

    def read_region(
        self,
        img_bgr: np.ndarray,
        kind: str = "generic",
        min_confidence: float = 0.35,
        text_threshold: float = 0.7,
    ) -> List[Tuple[Tuple[int, int, int, int], str, float]]:
        """EasyOCR ``readtext`` equivalent: CRAFT text detection over an
        arbitrary region, then one batched CRNN read of every found line.
        Returns [(box_xyxy, text, confidence)] top-to-bottom. Requires the
        engine to be built with text detector weights; without them a
        single-line read of the whole region is returned."""
        import cv2

        gray = self._to_gray(img_bgr)
        if self._craft_fwd is None:
            (text, conf), = self.read_batch([gray], kind, min_confidence=0.0)
            h, w = gray.shape[:2]
            return [((0, 0, w, h), text, conf)] if conf >= min_confidence else []

        from manual_yolo_tpu.models import craft as craft_mod

        h, w = img_bgr.shape[:2]
        # CRAFT input: multiple of 32, modest canvas
        side = int(np.clip(max(h, w), 64, 512))
        side = (side + 31) // 32 * 32
        rgb = img_bgr[..., ::-1].astype(np.float32) / 255.0
        canvas = np.zeros((side, side, 3), np.float32)
        s = min(side / h, side / w)
        nh, nw = max(1, round(h * s)), max(1, round(w * s))
        canvas[:nh, :nw] = cv2.resize(rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        scores = np.asarray(
            self._craft_fwd(self._craft_params, jnp.asarray(canvas[None]))
        )[0]
        boxes = craft_mod.text_regions_from_scores(
            scores, text_threshold=text_threshold
        )
        # map back to source pixels, pad a little, read all lines in ONE call
        out_boxes = []
        line_crops = []
        for (x1, y1, x2, y2) in sorted(boxes, key=lambda b: (b[1], b[0])):
            sx1 = max(0, int(x1 / s) - 2)
            sy1 = max(0, int(y1 / s) - 2)
            sx2 = min(w, int(x2 / s) + 2)
            sy2 = min(h, int(y2 / s) + 2)
            if sx2 - sx1 < 3 or sy2 - sy1 < 3:
                continue
            out_boxes.append((sx1, sy1, sx2, sy2))
            line_crops.append(gray[sy1:sy2, sx1:sx2])
        if not line_crops:
            return []
        reads = self.read_batch(line_crops, kind, min_confidence=0.0)
        return [
            (b, t, c) for b, (t, c) in zip(out_boxes, reads)
            if c >= min_confidence and t
        ]

    def read_fields(
        self,
        crops_bgr: List[Optional[np.ndarray]],
        class_names: List[str],
        min_confidence: float = 0.35,
    ) -> List[Optional[str]]:
        """Batched :meth:`read_field`: ONE recognizer call per field *kind*
        present instead of one device round trip per crop (the reference's
        live loop reads each crop serially — SURVEY.md hot loop (2)).

        Per-group failures degrade that group to unread (None) without
        killing the rest of the frame.
        """
        return [t for t, _ in self.read_fields_conf(
            crops_bgr, class_names, min_confidence
        )]

    def read_fields_conf(
        self,
        crops_bgr: List[Optional[np.ndarray]],
        class_names: List[str],
        min_confidence: float = 0.35,
    ) -> List[Tuple[Optional[str], float]]:
        """:meth:`read_fields` plus each field's winning-candidate
        confidence (-1.0 when unread). The confidence is the cascade's
        FAILURE-GATE signal: the reference escalates low-confidence reads
        at every tier (detect.py:186-189,205-226; yolo.py:629-747), and
        the vision-LLM tier here gates on it via :attr:`LLM_GATE`
        (calibrated on data/ocr_real — docs/PARITY.md failure-gate
        table)."""
        out: List[Optional[str]] = [None] * len(class_names)
        confs: List[float] = [-1.0] * len(class_names)
        groups: Dict[str, List[int]] = {}
        grays: List[Optional[np.ndarray]] = []
        shapes: List[Optional[Tuple[int, int]]] = []
        for i, (crop, name) in enumerate(zip(crops_bgr, class_names)):
            if crop is None or crop.size == 0:
                grays.append(None)
                shapes.append(None)
                continue
            grays.append(self._to_gray(crop))
            shapes.append(crop.shape[:2])
            groups.setdefault(field_kind(name), []).append(i)
        for kind, idxs in groups.items():
            try:
                # greedy first; only low-confidence / failed reads pay the
                # prefix-beam's ~25 ms/crop host cost (escalation threshold
                # calibrated on data/ocr_real — cli/eval_ocr.py --escalate)
                results = self.read_batch_candidates(
                    [grays[i] for i in idxs], kind, beam=False
                )
                esc_thr = self.beam_escalate_conf.get(kind, 1.01)
                escalate: List[int] = []
                for i, cands in zip(idxs, results):
                    low = class_names[i].lower()
                    out[i], confs[i] = self._pick_validated_conf(
                        kind, low, cands,
                        self._field_threshold(low, min_confidence),
                    )
                    if self.beam and (out[i] is None or confs[i] < esc_thr):
                        escalate.append(i)
                if escalate:
                    results = self.read_batch_candidates(
                        [grays[i] for i in escalate], kind, beam=True
                    )
                    for i, cands in zip(escalate, results):
                        low = class_names[i].lower()
                        v, vc = self._pick_validated_conf(
                            kind, low, cands,
                            self._field_threshold(low, min_confidence),
                        )
                        if v is not None:
                            out[i] = v
                            confs[i] = max(confs[i], vc)
            except Exception as e:  # degrade the group, keep the frame alive
                print(f"OCR batch error for kind={kind}: {e}")
                continue
        # CRAFT fallback: fields the single-line read left empty whose crop
        # is tall enough to hold >1 text line get a detect-then-read retry
        # (EasyOCR's readtext is exactly this two-stage cascade)
        if self._craft_fwd is not None:
            for i, (crop, name) in enumerate(zip(crops_bgr, class_names)):
                if out[i] is not None or crop is None or crop.size == 0:
                    continue
                if crop.shape[0] < 45:  # single UI lines are ~20-35 px
                    continue
                try:
                    out[i], rc = self._region_field(
                        crop, name, min_confidence
                    )
                    if out[i] is not None:
                        confs[i] = rc
                except Exception as e:
                    print(f"OCR region fallback error for {name}: {e}")
        # catastrophic-collapse demotion (see COLLAPSE_FLOOR)
        for i, name in enumerate(class_names):
            if out[i] is None or shapes[i] is None:
                continue
            if field_kind(name) not in self.COLLAPSE_KINDS:
                continue
            h, w = shapes[i]
            exp_chars = max(1.0, (w / max(h, 1)) / 0.55)
            if len(out[i]) / exp_chars < self.COLLAPSE_FLOOR:
                confs[i] = min(confs[i], 0.20)
        return list(zip(out, confs))

    def _region_field(
        self, crop_bgr: np.ndarray, class_name: str, min_confidence: float
    ) -> Tuple[Optional[str], float]:
        """read_region over a loose/multi-line crop, returning the first
        line whose text validates for the field (plus its confidence)."""
        kind = field_kind(class_name)
        low = class_name.lower()
        thr = self._field_threshold(low, min_confidence)
        for _box, text, conf in self.read_region(crop_bgr, kind, thr):
            v = self._validate(kind, low, text)
            if v:
                return v, float(conf)
        return None, -1.0


#: Default recognizer ensemble: two 32-px seeds fine-tuned on the real-crop
#: corpus, plus the 64-px high-resolution member (kind-gated in its meta to
#: name+game_id). 0.9562 exact-match on the 251 held-out real crops
#: (cli/eval_ocr.py), vs 0.948 for the previous two-member default.
DEFAULT_RECOGNIZER_WEIGHTS = (
    "weights/crnn_real_a.npz,weights/crnn_real_b.npz,weights/crnn_h64.npz"
)


def default_ocr_engine(
    weights: str = DEFAULT_RECOGNIZER_WEIGHTS,
    text_detector: Optional[str] = "weights/craft_real.npz",
) -> Optional["OCREngine"]:
    """Build the default OCR engine, or None if no weights exist.

    The default is an ENSEMBLE of CRNNs co-trained on synthetic renders
    AND the labelled real UI crops (data/ocr_real): every model's logits
    are decoded under every allowlist mask and preprocessing variant, all
    candidates competing on confidence. The third member runs a 64-px
    input canvas (2x the glyph pixels — fixes narrow-glyph name/id
    confusions) and is gated by its meta to name+game_id fields, where it
    measurably helps; on short numeric crops it truncates leading digits,
    so it never sees them. Held-out real-crop exact-match 0.9562 (names
    0.919, numerics 0.980) vs 0.948 for the two-member ensemble. Missing
    member files are dropped gracefully (a single present member =
    single-model engine).

    ``text_detector`` names optional CRAFT weights; when the file exists the
    engine gains ``read_region`` (EasyOCR readtext parity: detect text lines,
    then ONE batched recognizer call) and the multi-line fallback inside
    ``read_fields``. Missing file = recognizer-only engine, no error.

    The engine is itself callable with ``(crop_bgr, class_name)`` (the
    read_field contract), and additionally exposes ``read_fields`` so
    runtime loops can batch all of a frame's crops by field kind.
    """
    import os

    from manual_yolo_tpu.core.serialization import resolve_weight_path

    present = [
        p
        for p in (resolve_weight_path(q) for q in weights.split(",") if q)
        if os.path.exists(p)
    ]
    if not present:
        return None
    return OCREngine.from_npz(present, text_detector=text_detector)

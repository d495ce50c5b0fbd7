"""CTC decode (greedy, allowlist-masked) + confidence, jit-compatible.

Replaces the decode half of the vendored EasyOCR recognizer. The
reference applies per-field ALLOWLISTS at the OCR call
(``yolo.py:232,277,305``); here the allowlist is a logits mask applied
before argmax — on device, inside the same program as the recognizer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.models.crnn import BLANK, CHARSET


def allowlist_mask(allow: Optional[str]) -> np.ndarray:
    """Build a (NUM_CLASSES,) 0/-inf mask for an allowlist string."""
    m = np.zeros(len(CHARSET) + 1, np.float32)
    if allow is not None:
        allowed = set(allow)
        for i, c in enumerate(CHARSET):
            if c not in allowed:
                m[i + 1] = -np.inf
    return m


def greedy_decode(
    logits: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    score_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits (N, T, C) -> (ids (N, T) with collapsed repeats/blanks marked 0,
    confidence (N,) = mean prob of emitted frames).

    Emitted sequence: ids[t] kept where ids[t] != blank and ids[t] != ids[t-1].
    Non-emitted positions are set to 0 (= blank) so the host can join.

    ``score_mask`` (default = ``mask``) chooses the distribution confidences
    are computed under. When several allowlist masks decode the SAME logits
    and their confidences must be comparable, score all of them under one
    shared mask — a narrower mask renormalises softmax over fewer chars and
    otherwise inflates its own confidence.
    """
    dec_logits = logits
    if mask is not None:
        dec_logits = logits + mask[None, None, :]
    sm = mask if score_mask is None else score_mask
    score_logits = logits if sm is None else logits + sm[None, None, :]
    probs = jax.nn.softmax(score_logits, axis=-1)
    ids = jnp.argmax(dec_logits, axis=-1)  # (N, T)
    pmax = jnp.take_along_axis(probs, ids[..., None], axis=-1)[..., 0]  # (N, T)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    emit = (ids != BLANK) & (ids != prev)
    out_ids = jnp.where(emit, ids, 0)
    n_emit = jnp.sum(emit, axis=1)
    conf_sum = jnp.sum(jnp.where(emit, pmax, 0.0), axis=1)
    conf = jnp.where(n_emit > 0, conf_sum / jnp.maximum(n_emit, 1), 0.0)
    return out_ids, conf


def decode_to_text(out_ids: np.ndarray) -> str:
    """Host: collapse one row of greedy_decode output to a string."""
    return "".join(CHARSET[i - 1] for i in np.asarray(out_ids) if i > 0)


def ctc_forward_score(logp: np.ndarray, ids) -> float:
    """Host CTC forward algorithm: log P(ids | logp) summed over all
    alignments. ``logp`` (T, C) log-probabilities, ``ids`` a sequence of
    non-blank char ids. O(T * len(ids)).

    Used to RESCORE decode candidates under several models' posteriors
    (ensemble-sum): a candidate that one model's beam ranks second often
    wins the summed score when the top candidate's lead is a single-model
    idiosyncrasy."""
    T, _ = logp.shape
    L = len(ids)
    if L == 0:
        # all-blank path (the general recursion below would mis-broadcast
        # its skip shift on the length-1 alpha)
        return float(logp[:, BLANK].sum())
    ext = np.zeros(2 * L + 1, np.int64)
    ext[1::2] = ids
    NEG = -np.inf
    alpha = np.full(2 * L + 1, NEG)
    alpha[0] = logp[0, BLANK]
    if L:
        alpha[1] = logp[0, ids[0]]
    for t in range(1, T):
        prev = alpha
        shifted1 = np.concatenate(([NEG], prev[:-1]))
        stay = np.logaddexp(prev, shifted1)
        shifted2 = np.concatenate(([NEG, NEG], prev[:-2]))
        can_skip = np.zeros(2 * L + 1, bool)
        can_skip[2:] = (ext[2:] != BLANK) & (ext[2:] != ext[:-2])
        tot = np.where(can_skip, np.logaddexp(stay, shifted2), stay)
        alpha = tot + logp[t, ext]
    return float(np.logaddexp(alpha[-1], alpha[-2] if L else NEG))


def score_candidates(logp: np.ndarray, candidates: Sequence) -> np.ndarray:
    """``ctc_forward_score`` for MANY candidates against one (T, C)
    posterior — one native call when the host library is available
    (native/runtime.cpp::ctc_score_multi), else the numpy loop. Used by the
    ensemble rescorer, where the per-candidate Python/numpy overhead was
    the dominant host cost of a beam-refined read."""
    from manual_yolo_tpu.runtime.native import ctc_score_multi_native

    out = ctc_score_multi_native(logp, candidates)
    if out is not None:
        return out
    return np.asarray(
        [ctc_forward_score(logp, ids) for ids in candidates], np.float32
    )


def prefix_beam_decode(
    logp: np.ndarray,
    beam_width: int = 8,
    topk_chars: int = 6,
    prune_lp: float = -9.0,
) -> list:
    """Host CTC prefix beam search over ``logp`` (T, C) log-probabilities
    (already allowlist-masked + log-softmaxed).

    Greedy decode picks the single best *path*, which systematically
    collapses doubled characters ("55" needs a blank frame between the two
    5s on the best path even when the summed-alignment posterior clearly
    prefers "55" — the dominant real-crop error class). Prefix beam search
    sums path mass per *prefix*, recovering those.

    Per frame only the ``topk_chars`` most probable characters above
    ``prune_lp`` are considered (beam cost is tiny: ~beam*topk per frame).
    Returns [(text_ids tuple, log_posterior)] best-first, length
    <= beam_width.

    The tight loop runs in native C++ when the host runtime library is
    available (native/runtime.cpp::ctc_beam — same algorithm, ~100x
    faster, which is what lets the streaming loop afford beam refinement);
    this numpy implementation is the fallback and the parity oracle
    (tests/test_native.py).
    """
    from manual_yolo_tpu.runtime.native import ctc_beam_native

    native = ctc_beam_native(logp, beam_width, topk_chars, prune_lp)
    if native is not None:
        return native
    T, C = logp.shape
    NEG = -np.inf

    def lse(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + np.log1p(np.exp(-abs(a - b)))

    # beams: prefix tuple -> [p_blank, p_nonblank] (log mass ending in
    # blank / in the prefix's last char)
    beams = {(): [0.0, NEG]}
    # python-float view of logp for speed in the tight loop
    lp_np = np.asarray(logp, np.float64)
    order = np.argsort(-lp_np, axis=1)[:, : max(topk_chars, 1)]
    for t in range(T):
        lp = lp_np[t]
        lpb = lp[BLANK]
        cand_chars = [int(c) for c in order[t] if c != BLANK and lp[c] > prune_lp]
        new: dict = {}
        for prefix, (pb, pnb) in beams.items():
            total = lse(pb, pnb)
            # stay: extend with blank, or repeat the last char's frame
            ent = new.get(prefix)
            if ent is None:
                ent = new[prefix] = [NEG, NEG]
            ent[0] = lse(ent[0], total + lpb)
            last = prefix[-1] if prefix else -1
            if last >= 0:
                ent[1] = lse(ent[1], pnb + lp[last])
            for c in cand_chars:
                npfx = prefix + (c,)
                ent2 = new.get(npfx)
                if ent2 is None:
                    ent2 = new[npfx] = [NEG, NEG]
                if c == last:
                    # a genuine repeat needs blank-separated mass
                    ent2[1] = lse(ent2[1], pb + lp[c])
                else:
                    ent2[1] = lse(ent2[1], total + lp[c])
        beams = dict(
            sorted(new.items(), key=lambda kv: -lse(*kv[1]))[:beam_width]
        )
    out = [(pfx, lse(*v)) for pfx, v in beams.items()]
    out.sort(key=lambda kv: -kv[1])
    return out

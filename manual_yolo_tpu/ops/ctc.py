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

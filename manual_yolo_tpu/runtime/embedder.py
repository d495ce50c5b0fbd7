"""Batched appearance embedder for DeepSORT-style tracking.

The reference's ``deep_sort_realtime`` tracker embeds crops by default with
a mobilenet (``pipe.py:161-162`` defaults — ``embedder='mobilenet'``). The
TPU-native equivalent reuses the rank-classifier backbone we already ship:
all detection crops of a frame are resized on host to a fixed canvas and
pushed through the backbone in ONE device call; the global-average-pooled
feature map, L2-normalised, is the appearance vector.

Plugs into :class:`manual_yolo_tpu.track.deepsort.DeepSortTracker` via its
``embedder`` argument (crops -> (N, D) unit vectors).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.models import yolov8


class AppearanceEmbedder:
    """crops (variable-size BGR uint8) -> (N, D) float32 unit vectors."""

    def __init__(
        self,
        params,
        spec: yolov8.ModelSpec,
        size: int = 64,
        compute_dtype=jnp.float32,
        max_batch: int = 64,
    ):
        self.params = params
        self.spec = spec
        self.size = size
        self.max_batch = max_batch

        def embed(params, x):
            feats = yolov8.forward_features(params, spec, x, compute_dtype)
            pooled = jnp.mean(feats[-1].astype(jnp.float32), axis=(1, 2))
            norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            return pooled / jnp.maximum(norm, 1e-6)

        self._embed = jax.jit(embed)

    @classmethod
    def from_npz(cls, path: str, **kw) -> "AppearanceEmbedder":
        """Build from a native classifier checkpoint (backbone reused)."""
        from manual_yolo_tpu.core.serialization import load_params

        params, meta = load_params(path)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        sp = meta.get("spec", {})
        spec = yolov8.build_spec(
            sp.get("variant", "classify"), sp.get("scale", "n"),
            int(sp.get("nc", 13)),
        )
        params = yolov8.fold_params(params, spec)
        return cls(params, spec, **kw)

    def _preprocess(self, crop_bgr: np.ndarray) -> np.ndarray:
        import cv2

        if crop_bgr.ndim == 2:
            crop_bgr = np.stack([crop_bgr] * 3, axis=-1)
        if crop_bgr.size == 0:
            return np.zeros((self.size, self.size, 3), np.float32)
        img = cv2.resize(
            crop_bgr, (self.size, self.size), interpolation=cv2.INTER_LINEAR
        )
        return img[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB

    def __call__(self, crops: Sequence[np.ndarray]) -> np.ndarray:
        if not len(crops):
            return np.zeros((0, 1), np.float32)
        batch = np.stack([self._preprocess(c) for c in crops])
        # pad to max_batch buckets so the jit signature stays stable
        n = len(batch)
        bucket = min(self.max_batch, 1 << (max(n - 1, 0)).bit_length() or 1)
        bucket = max(bucket, 1)
        if n < bucket:
            batch = np.concatenate(
                [batch, np.zeros((bucket - n,) + batch.shape[1:], batch.dtype)]
            )
        out = np.asarray(self._embed(self.params, jnp.asarray(batch)))
        return out[:n]


REID_WEIGHTS = "weights/reid_embedder.npz"
FALLBACK_WEIGHTS = "weights/rank_classifier_matched.npz"


def default_embedder(weights: str = "") -> Optional[AppearanceEmbedder]:
    """Resolve the tracking embedder (cfg.track.embedder_weights).

    Empty ``weights`` selects the purpose-trained re-id checkpoint
    (``train/embedder.py``) when shipped, else falls back to the
    rank-classifier backbone features — the round-1/2 stand-in."""
    import os

    for cand in ([weights] if weights else [REID_WEIGHTS, FALLBACK_WEIGHTS]):
        if cand and os.path.exists(cand):
            return AppearanceEmbedder.from_npz(cand)
    return None

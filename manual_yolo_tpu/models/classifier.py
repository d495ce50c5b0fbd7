"""Rank classifier: the TPU-native equivalent of ``rank_classifier.pt`` usage.

Reference behaviour being matched (``detect.py:115-139``): a YOLOv8n-cls
network over 64x64 card-rank crops, 13 classes (10,2..9,A,J,K,Q), returning
top-1 class + confidence, thresholded at 0.40 (0.20 for turn/river crops).

The reference runs one crop at a time through ultralytics (serial — the
central perf bug noted in SURVEY.md §3.1); here the forward is batched: all
rank crops of a frame go through the network in ONE device call, padded to a
fixed batch so the jit signature is stable.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.core.weights import load_torch_checkpoint
from manual_yolo_tpu.models import yolov8

IMG_SIZE = 64
RANK_NAMES_13 = ["10", "2", "3", "4", "5", "6", "7", "8", "9", "A", "J", "K", "Q"]


def preprocess_crop_host(bgr: np.ndarray, size: int = IMG_SIZE) -> np.ndarray:
    """Host-side preprocessing for a single variable-size BGR crop.

    Matches ultralytics classify inference semantics: BGR->RGB, resize the
    short side to ``size`` (bilinear), center-crop to ``size`` x ``size``,
    scale to [0,1]. Used for file/eval paths; the live pipeline extracts
    fixed-size crops on device instead (runtime/pipeline.py).
    """
    from PIL import Image

    rgb = bgr[..., ::-1]
    img = Image.fromarray(rgb)
    w, h = img.size
    scale = size / min(w, h)
    nw, nh = max(size, round(w * scale)), max(size, round(h * scale))
    img = img.resize((nw, nh), Image.BILINEAR)
    left, top = (nw - size) // 2, (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, dtype=np.float32) / 255.0


class RankClassifier:
    """Batched JAX rank classifier with ultralytics-checkpoint import."""

    def __init__(
        self,
        params,
        spec: yolov8.ModelSpec,
        names: Dict[int, str],
        compute_dtype=jnp.float32,
        max_batch: int = 16,
    ):
        self.params = params
        self.spec = spec
        self.names = dict(names)
        self.compute_dtype = compute_dtype
        self.max_batch = max_batch
        self._forward = jax.jit(
            partial(
                yolov8.forward_classify,
                spec=self.spec,
                compute_dtype=self.compute_dtype,
            )
        )

    @classmethod
    def from_torch_checkpoint(
        cls, path: str, compute_dtype=jnp.float32, max_batch: int = 16
    ) -> "RankClassifier":
        ckpt = load_torch_checkpoint(path)
        nc = len(ckpt.names) or 13
        scale = (ckpt.arch_yaml or {}).get("scale", "n")
        spec = yolov8.build_spec("classify", scale, nc)
        params = yolov8.import_torch_state(ckpt.state, spec, fold=True)
        names = ckpt.names or {i: n for i, n in enumerate(RANK_NAMES_13)}
        return cls(params, spec, names, compute_dtype, max_batch)

    @classmethod
    def from_npz(cls, path: str, compute_dtype=jnp.float32, fold: bool = True) -> "RankClassifier":
        """Load a native checkpoint written by the TPU trainer."""
        from manual_yolo_tpu.core.serialization import load_params

        params, meta = load_params(path)
        sp = meta.get("spec", {})
        spec = yolov8.build_spec(
            sp.get("variant", "classify"), sp.get("scale", "n"), int(sp.get("nc", 13))
        )
        # fold on HOST numpy BEFORE any device placement: folding device
        # arrays would issue ~100 small device->host fetches, each of which
        # can hang on a flaky tunnel and the first of which permanently
        # degrades the process's upload rate (docs/BENCH_NOTES.md)
        if fold:
            params = yolov8.fold_params(params, spec)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        names = {int(k): v for k, v in meta.get("names", {}).items()}
        return cls(params, spec, names or {i: n for i, n in enumerate(RANK_NAMES_13)},
                   compute_dtype)

    @classmethod
    def random_init(cls, key, scale: str = "n", nc: int = 13) -> "RankClassifier":
        spec = yolov8.build_spec("classify", scale, nc)
        params = yolov8.init_params(key, spec)
        return cls(params, spec, {i: n for i, n in enumerate(RANK_NAMES_13[:nc])})

    def logits(self, batch: jnp.ndarray) -> jnp.ndarray:
        """batch: (N, 64, 64, 3) RGB float in [0,1] -> (N, nc) logits."""
        return self._forward(self.params, x=batch)

    def predict_probs(self, batch: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.softmax(self.logits(batch), axis=-1)

    def classify_crops(
        self, crops_bgr: Sequence[np.ndarray]
    ) -> List[Tuple[str, float]]:
        """Reference-parity API: list of BGR crops -> [(rank_name, conf)].

        Equivalent to looping ``rank_model(crop)[0].probs`` in the reference
        (``detect.py:121-125``) but with ONE batched device call.
        """
        if not crops_bgr:
            return []
        batch = np.stack([preprocess_crop_host(c) for c in crops_bgr])
        probs = np.asarray(self.predict_probs(jnp.asarray(batch)))
        out = []
        for p in probs:
            top = int(np.argmax(p))
            out.append((self.names.get(top, str(top)), float(p[top])))
        return out

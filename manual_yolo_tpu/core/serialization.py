"""Native checkpoint format: params pytree <-> single ``.npz`` file.

Replaces the reference's torch-pickle checkpoints (``rank_classifier.pt``,
``best.pt``/``last.pt`` under ``runs/``, reference ``class.py:34-37``) with a
self-describing, pickle-free format: a JSON structure template plus numbered
arrays. fp16 storage halves checkpoint size (the reference ships fp16 too).
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _encode(tree, leaves: list):
    if isinstance(tree, dict):
        return {"t": "d", "k": {k: _encode(v, leaves) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {
            "t": "l" if isinstance(tree, list) else "t",
            "v": [_encode(v, leaves) for v in tree],
        }
    leaves.append(np.asarray(tree))
    return {"t": "a", "i": len(leaves) - 1}


def _decode(node, leaves):
    t = node["t"]
    if t == "d":
        return {k: _decode(v, leaves) for k, v in node["k"].items()}
    if t in ("l", "t"):
        seq = [_decode(v, leaves) for v in node["v"]]
        return seq if t == "l" else tuple(seq)
    return leaves[node["i"]]


def save_params(
    path: str, params: Any, meta: Optional[Dict[str, Any]] = None, dtype=np.float16
):
    """Save a params pytree (nested dict/list of arrays) to ``path`` (.npz)."""
    leaves: list = []
    struct = _encode(params, leaves)
    payload = {"__struct__": np.frombuffer(
        json.dumps({"struct": struct, "meta": meta or {}}).encode(), dtype=np.uint8
    )}
    for i, a in enumerate(leaves):
        if dtype is not None and a.dtype == np.float32:
            a = a.astype(dtype)
        payload[f"a{i}"] = a
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def resolve_weight_path(path: str) -> str:
    """Resolve a relative weight path against the repo root when it does not
    exist in the CWD — the CLIs default to ``weights/<name>.npz`` and must
    keep working when invoked from any directory (package-boundary use)."""
    if not path or os.path.isabs(path) or os.path.exists(path):
        return path
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(root, path)
    return cand if os.path.exists(cand) else path


def load_params(path: str, dtype=np.float32) -> Tuple[Any, Dict[str, Any]]:
    """Load a params pytree; returns (params, meta). Relative paths that
    don't exist in the CWD fall back to the repo root (CLI defaults)."""
    path = resolve_weight_path(path)
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__struct__"].tobytes()).decode())
        n = sum(1 for k in z.files if k.startswith("a"))
        leaves = []
        for i in range(n):
            a = z[f"a{i}"]
            if dtype is not None and a.dtype in (np.float16, np.float32, np.float64):
                a = a.astype(dtype)
            leaves.append(a)
    params = _decode(header["struct"], leaves)
    return params, header.get("meta", {})

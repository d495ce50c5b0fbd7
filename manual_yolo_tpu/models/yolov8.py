"""YOLOv8 graphs (detect + classify) as pure-JAX functional models.

This re-implements, TPU-first, the network the reference consumes through
ultralytics (reference ``detect.py:20-21``, ``pipe.py:147``, ``yolo.py:354``,
``class.py:19``): CSP backbone (Conv/C2f), SPPF, FPN/PAN neck, Detect head
with DFL box decode, and the Classify head used by ``rank_classifier.pt``.

Design notes (TPU):
  * NHWC layout + HWIO kernels — XLA's native TPU conv layout.
  * Params are plain nested-dict pytrees; the forward is a pure function, so
    it composes with jit / grad / vmap / pjit without a module framework.
  * BatchNorm is kept explicit for training and folded into conv bias for
    inference (`fold_params`) — one fused conv+bias+SiLU per block, which XLA
    fuses into a single MXU matmul + VPU epilogue.
  * bf16 compute with f32 accumulation (``preferred_element_type``) keeps the
    MXU fed at full rate without accuracy loss.
  * All shapes static; variable-length outputs (detections) are padded to a
    fixed maximum downstream (see ops/nms.py).

Layer spec lists mirror the ultralytics yolov8 yaml graph (verified against
the architecture dict embedded in the reference ``rank_classifier.pt``) but
the implementation is original JAX.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from manual_yolo_tpu.core.weights import conv_oihw_to_hwio, fold_batchnorm

BN_EPS = 1e-3  # ultralytics Conv uses BatchNorm2d(eps=0.001)
BN_MOMENTUM = 0.03
REG_MAX = 16  # DFL bins in the Detect head

# depth_multiple, width_multiple, max_channels per scale
SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 576),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}
# classification variant caps channels at 1024 for every scale
CLS_SCALES = {k: (d, w, 1024) for k, (d, w, _) in SCALES.items()}


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


@dataclass(frozen=True)
class Layer:
    kind: str  # conv | c2f | sppf | upsample | concat | detect | classify
    cin: int = 0
    cout: int = 0
    k: int = 1
    s: int = 1
    n: int = 1  # bottleneck repeats for c2f
    shortcut: bool = False
    src: Tuple[int, ...] = (-1,)  # input layer indices (concat has 2)


@dataclass(frozen=True)
class ModelSpec:
    variant: str  # "detect" | "classify"
    scale: str
    nc: int
    layers: Tuple[Layer, ...]
    out_channels: Tuple[int, ...] = ()  # detect: per-level channels
    strides: Tuple[int, ...] = (8, 16, 32)


def _scaled(c: int, width: float, max_ch: int) -> int:
    return make_divisible(min(c, max_ch) * width)


def build_spec(variant: str = "detect", scale: str = "n", nc: int = 64) -> ModelSpec:
    """Construct the layer graph for a yolov8{scale}[-cls] model."""
    depth, width, max_ch = (CLS_SCALES if variant == "classify" else SCALES)[scale]
    d = lambda n: max(round(n * depth), 1)
    w = lambda c: _scaled(c, width, max_ch)

    L: List[Layer] = []
    # --- backbone (shared) ---
    L.append(Layer("conv", 3, w(64), 3, 2))                                   # 0  P1/2
    L.append(Layer("conv", w(64), w(128), 3, 2))                              # 1  P2/4
    L.append(Layer("c2f", w(128), w(128), n=d(3), shortcut=True))             # 2
    L.append(Layer("conv", w(128), w(256), 3, 2))                             # 3  P3/8
    L.append(Layer("c2f", w(256), w(256), n=d(6), shortcut=True))             # 4
    L.append(Layer("conv", w(256), w(512), 3, 2))                             # 5  P4/16
    L.append(Layer("c2f", w(512), w(512), n=d(6), shortcut=True))             # 6
    L.append(Layer("conv", w(512), w(1024), 3, 2))                            # 7  P5/32
    L.append(Layer("c2f", w(1024), w(1024), n=d(3), shortcut=True))           # 8

    if variant == "classify":
        L.append(Layer("classify", w(1024), nc))                              # 9
        return ModelSpec(variant, scale, nc, tuple(L))

    L.append(Layer("sppf", w(1024), w(1024), k=5))                            # 9
    # --- FPN/PAN neck + head ---
    L.append(Layer("upsample"))                                               # 10
    L.append(Layer("concat", src=(-1, 6)))                                    # 11
    L.append(Layer("c2f", w(1024) + w(512), w(512), n=d(3), shortcut=False))  # 12
    L.append(Layer("upsample"))                                               # 13
    L.append(Layer("concat", src=(-1, 4)))                                    # 14
    L.append(Layer("c2f", w(512) + w(256), w(256), n=d(3), shortcut=False))   # 15 (P3)
    L.append(Layer("conv", w(256), w(256), 3, 2))                             # 16
    L.append(Layer("concat", src=(-1, 12)))                                   # 17
    L.append(Layer("c2f", w(256) + w(512), w(512), n=d(3), shortcut=False))   # 18 (P4)
    L.append(Layer("conv", w(512), w(512), 3, 2))                             # 19
    L.append(Layer("concat", src=(-1, 9)))                                    # 20
    L.append(Layer("c2f", w(512) + w(1024), w(1024), n=d(3), shortcut=False)) # 21 (P5)
    L.append(Layer("detect", src=(15, 18, 21)))                               # 22
    return ModelSpec(
        variant, scale, nc, tuple(L), out_channels=(w(256), w(512), w(1024))
    )


# ---------------------------------------------------------------------------
# Parameter init / import
# ---------------------------------------------------------------------------


def _init_conv(key, cin, cout, k, with_bn=True) -> Dict[str, Any]:
    # kaiming-uniform fan_in, matching torch's default conv init behaviour
    fan_in = cin * k * k
    bound = math.sqrt(6.0 / fan_in)
    w = jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)
    p = {"w": w}
    if with_bn:
        p["bn"] = {
            "gamma": jnp.ones((cout,), jnp.float32),
            "beta": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        }
    else:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_c2f(key, cin, cout, n) -> Dict[str, Any]:
    c = int(cout * 0.5)
    keys = jax.random.split(key, 2 + 2 * n)
    p = {
        "cv1": _init_conv(keys[0], cin, 2 * c, 1),
        "cv2": _init_conv(keys[1], (2 + n) * c, cout, 1),
        "m": [],
    }
    for i in range(n):
        p["m"].append(
            {
                "cv1": _init_conv(keys[2 + 2 * i], c, c, 3),
                "cv2": _init_conv(keys[3 + 2 * i], c, c, 3),
            }
        )
    return p


def init_params(key, spec: ModelSpec) -> List[Any]:
    """Random-init a parameter pytree for the given spec (training from scratch)."""
    params: List[Any] = []
    keys = jax.random.split(key, len(spec.layers))
    for lk, layer in zip(keys, spec.layers):
        if layer.kind == "conv":
            params.append(_init_conv(lk, layer.cin, layer.cout, layer.k))
        elif layer.kind == "c2f":
            params.append(_init_c2f(lk, layer.cin, layer.cout, layer.n))
        elif layer.kind == "sppf":
            c_ = layer.cin // 2
            k1, k2 = jax.random.split(lk)
            params.append(
                {
                    "cv1": _init_conv(k1, layer.cin, c_, 1),
                    "cv2": _init_conv(k2, c_ * 4, layer.cout, 1),
                }
            )
        elif layer.kind == "classify":
            c_ = 1280
            k1, k2 = jax.random.split(lk)
            fan_in = c_
            bound = math.sqrt(1.0 / fan_in)
            params.append(
                {
                    "conv": _init_conv(k1, layer.cin, c_, 1),
                    "linear": {
                        "w": jax.random.uniform(
                            k2, (c_, layer.cout), jnp.float32, -bound, bound
                        ),
                        "b": jnp.zeros((layer.cout,), jnp.float32),
                    },
                }
            )
        elif layer.kind == "detect":
            params.append(_init_detect(lk, spec))
        else:  # upsample / concat — no params
            params.append({})
    return params


def _init_detect(key, spec: ModelSpec) -> Dict[str, Any]:
    ch = spec.out_channels
    nc = spec.nc
    c2 = max(16, ch[0] // 4, REG_MAX * 4)
    c3 = max(ch[0], min(nc, 100))
    keys = jax.random.split(key, 6 * len(ch))
    box, cls = [], []
    for i, c in enumerate(ch):
        k = keys[6 * i : 6 * i + 6]
        box.append(
            {
                "0": _init_conv(k[0], c, c2, 3),
                "1": _init_conv(k[1], c2, c2, 3),
                "2": _init_conv(k[2], c2, 4 * REG_MAX, 1, with_bn=False),
            }
        )
        cls.append(
            {
                "0": _init_conv(k[3], c, c3, 3),
                "1": _init_conv(k[4], c3, c3, 3),
                "2": _init_conv(k[5], c3, nc, 1, with_bn=False),
            }
        )
    # bias init per ultralytics Detect.bias_init: box bias 1.0,
    # cls bias log(5/nc/(640/stride)^2)
    for i, s in enumerate(spec.strides):
        box[i]["2"]["b"] = jnp.full((4 * REG_MAX,), 1.0, jnp.float32)
        cls[i]["2"]["b"] = jnp.full(
            (nc,), math.log(5 / nc / (640 / s) ** 2), jnp.float32
        )
    return {"box": box, "cls": cls}


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------


def _import_conv(state: Dict[str, np.ndarray], prefix: str, fold: bool) -> Dict[str, Any]:
    w = state[prefix + "conv.weight"]
    if prefix + "bn.weight" in state:
        g, b = state[prefix + "bn.weight"], state[prefix + "bn.bias"]
        m, v = state[prefix + "bn.running_mean"], state[prefix + "bn.running_var"]
        if fold:
            wf, bf = fold_batchnorm(w, g, b, m, v, BN_EPS)
            return {"w": jnp.asarray(wf), "b": jnp.asarray(bf)}
        return {
            "w": jnp.asarray(conv_oihw_to_hwio(w)),
            "bn": {
                "gamma": jnp.asarray(g),
                "beta": jnp.asarray(b),
                "mean": jnp.asarray(m),
                "var": jnp.asarray(v),
            },
        }
    p = {"w": jnp.asarray(conv_oihw_to_hwio(w))}
    if prefix + "conv.bias" in state:
        p["b"] = jnp.asarray(state[prefix + "conv.bias"])
    return p


def _import_plain_conv(state, prefix: str) -> Dict[str, Any]:
    """A bare nn.Conv2d (no BN), e.g. the last conv of each Detect branch."""
    p = {"w": jnp.asarray(conv_oihw_to_hwio(state[prefix + "weight"]))}
    if prefix + "bias" in state:
        p["b"] = jnp.asarray(state[prefix + "bias"])
    return p


def _import_c2f(state, prefix: str, n: int, fold: bool) -> Dict[str, Any]:
    p = {
        "cv1": _import_conv(state, prefix + "cv1.", fold),
        "cv2": _import_conv(state, prefix + "cv2.", fold),
        "m": [],
    }
    for i in range(n):
        p["m"].append(
            {
                "cv1": _import_conv(state, f"{prefix}m.{i}.cv1.", fold),
                "cv2": _import_conv(state, f"{prefix}m.{i}.cv2.", fold),
            }
        )
    return p


def import_torch_state(
    state: Dict[str, np.ndarray], spec: ModelSpec, fold: bool = True
) -> List[Any]:
    """Convert an ultralytics flat state dict into our parameter pytree.

    ``fold=True`` folds BatchNorm into conv biases (inference mode).
    """
    params: List[Any] = []
    for idx, layer in enumerate(spec.layers):
        pre = f"model.{idx}."
        if layer.kind == "conv":
            params.append(_import_conv(state, pre, fold))
        elif layer.kind == "c2f":
            params.append(_import_c2f(state, pre, layer.n, fold))
        elif layer.kind == "sppf":
            params.append(
                {
                    "cv1": _import_conv(state, pre + "cv1.", fold),
                    "cv2": _import_conv(state, pre + "cv2.", fold),
                }
            )
        elif layer.kind == "classify":
            params.append(
                {
                    "conv": _import_conv(state, pre + "conv.", fold),
                    "linear": {
                        "w": jnp.asarray(state[pre + "linear.weight"].T),
                        "b": jnp.asarray(state[pre + "linear.bias"]),
                    },
                }
            )
        elif layer.kind == "detect":
            box, cls = [], []
            for i in range(len(spec.out_channels)):
                box.append(
                    {
                        "0": _import_conv(state, f"{pre}cv2.{i}.0.", fold),
                        "1": _import_conv(state, f"{pre}cv2.{i}.1.", fold),
                        "2": _import_plain_conv(state, f"{pre}cv2.{i}.2."),
                    }
                )
                cls.append(
                    {
                        "0": _import_conv(state, f"{pre}cv3.{i}.0.", fold),
                        "1": _import_conv(state, f"{pre}cv3.{i}.1.", fold),
                        "2": _import_plain_conv(state, f"{pre}cv3.{i}.2."),
                    }
                )
            params.append({"box": box, "cls": cls})
        else:
            params.append({})
    return params


def fold_params(params: List[Any], spec: ModelSpec) -> List[Any]:
    """Fold explicit BN sub-dicts into conv biases (training -> inference).

    Folding is pure host numpy. If the tree holds device arrays, fetch it
    in ONE bulk ``jax.device_get`` first: folding leaf-by-leaf would issue
    ~100 small device->host fetches — on a tunnelled chip each can hang,
    and the first permanently degrades the process's upload rate
    (docs/BENCH_NOTES.md "download poison").
    """
    import jax

    if any(
        isinstance(leaf, jax.Array)
        for leaf in jax.tree_util.tree_leaves(params)
    ):
        params = jax.device_get(params)

    def fold_conv(p):
        if "bn" not in p:
            return p
        bn = p["bn"]
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW
        wf, bf = fold_batchnorm(
            w,
            np.asarray(bn["gamma"]),
            np.asarray(bn["beta"]),
            np.asarray(bn["mean"]),
            np.asarray(bn["var"]),
            BN_EPS,
        )
        return {"w": jnp.asarray(wf), "b": jnp.asarray(bf)}

    def rec(p):
        if isinstance(p, dict):
            if "w" in p:
                return fold_conv(p)
            return {k: rec(v) for k, v in p.items()}
        if isinstance(p, list):
            return [rec(v) for v in p]
        return p

    return [rec(p) for p in params]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _conv2d(x, w, stride=1, groups=1, compute_dtype=jnp.float32):
    k = w.shape[0]
    p = k // 2
    # MXU accumulates bf16 inputs in f32 internally; emitting the compute
    # dtype keeps forward/backward conv dtypes consistent under grad (the
    # f32 epilogue comes from the BN/bias add which promotes).
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=compute_dtype,
    )


class BNCtx:
    """Collects batch-norm batch statistics during a train-mode forward.

    Updates are keyed by the conv block's path string (stable across jit /
    grad retracing); ``apply_bn_updates`` splices them back into the params
    pytree using the same path scheme.
    """

    def __init__(self, momentum: float = BN_MOMENTUM):
        self.momentum = momentum
        self.updates: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}


def conv_block(p, x, stride=1, act=True, compute_dtype=jnp.float32, bn_ctx=None, path=""):
    """Conv + (BN|bias) + SiLU.

    Hidden (``act=True``) folded-inference layers keep the bias-add + SiLU
    epilogue in ``compute_dtype``, so under bf16 the inter-layer activation
    tensors are written/read at 2 bytes/element — the conv stack is HBM
    bandwidth-bound at batch 64 (docs/BENCH_NOTES.md roofline) and f32
    epilogues doubled that traffic. Output/head layers (``act=False``) and
    the BN (training) path still promote to f32: DFL/box decode and batch
    statistics stay full precision.

    With ``bn_ctx`` set, BN uses batch statistics (train mode) and records
    updated running stats into the context under ``path``.
    """
    y = _conv2d(x, p["w"], stride, compute_dtype=compute_dtype)
    if "bn" in p:
        bn = p["bn"]
        if bn_ctx is not None:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
            m = bn_ctx.momentum
            n = y.shape[0] * y.shape[1] * y.shape[2]
            unbiased = var * n / max(n - 1, 1)
            bn_ctx.updates[path] = (
                jax.lax.stop_gradient((1 - m) * bn["mean"] + m * mean),
                jax.lax.stop_gradient((1 - m) * bn["var"] + m * unbiased),
            )
        else:
            mean, var = bn["mean"], bn["var"]
        inv = jax.lax.rsqrt(var + BN_EPS)
        y = (y - mean) * (bn["gamma"] * inv) + bn["beta"]
    elif "b" in p:
        b = p["b"].astype(y.dtype) if act else p["b"]
        y = y + b
    if act:
        y = jax.nn.silu(y)
    return y


def apply_bn_updates(params, updates: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]):
    """Splice BNCtx-collected running stats back into a params pytree."""
    consumed = set()

    def rec(p, path):
        if isinstance(p, dict):
            if "w" in p and "bn" in p and path in updates:
                consumed.add(path)
                mean, var = updates[path]
                return dict(p, bn=dict(p["bn"], mean=mean, var=var))
            return {k: rec(v, f"{path}.{k}" if path else k) for k, v in p.items()}
        if isinstance(p, list):
            return [rec(v, f"{path}.{i}") for i, v in enumerate(p)]
        return p

    out = [rec(p, str(i)) for i, p in enumerate(params)]
    missing = set(updates) - consumed
    assert not missing, f"unconsumed BN updates: {sorted(missing)[:5]}"
    return out


def _bottleneck(p, x, shortcut, compute_dtype, bn_ctx=None, path=""):
    y = conv_block(p["cv1"], x, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.cv1")
    y = conv_block(p["cv2"], y, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.cv2")
    return x + y if shortcut else y


def c2f_block(p, x, n, shortcut, compute_dtype=jnp.float32, bn_ctx=None, path=""):
    y = conv_block(p["cv1"], x, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.cv1")
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        parts.append(
            _bottleneck(p["m"][i], parts[-1], shortcut, compute_dtype, bn_ctx, f"{path}.m.{i}")
        )
    return conv_block(
        p["cv2"], jnp.concatenate(parts, axis=-1), compute_dtype=compute_dtype,
        bn_ctx=bn_ctx, path=f"{path}.cv2",
    )


def sppf_block(p, x, k=5, compute_dtype=jnp.float32, bn_ctx=None, path=""):
    y = conv_block(p["cv1"], x, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.cv1")

    def pool(v):
        return jax.lax.reduce_window(
            v,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)),
        )

    p1 = pool(y)
    p2 = pool(p1)
    p3 = pool(p2)
    return conv_block(
        p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1), compute_dtype=compute_dtype,
        bn_ctx=bn_ctx, path=f"{path}.cv2",
    )


def _upsample2x(x):
    # nearest-neighbour 2x, exact match of torch Upsample(scale_factor=2, mode='nearest')
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def classify_head(p, x, compute_dtype=jnp.float32, bn_ctx=None, path=""):
    y = conv_block(p["conv"], x, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.conv")
    y = jnp.mean(y, axis=(1, 2))  # global average pool
    logits = (
        jnp.dot(y.astype(compute_dtype), p["linear"]["w"].astype(compute_dtype),
                preferred_element_type=compute_dtype)
        + p["linear"]["b"]
    )
    return logits


def _detect_branch(branch, x, compute_dtype, bn_ctx=None, path=""):
    y = conv_block(branch["0"], x, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.0")
    y = conv_block(branch["1"], y, compute_dtype=compute_dtype, bn_ctx=bn_ctx, path=f"{path}.1")
    return conv_block(branch["2"], y, act=False, compute_dtype=compute_dtype,
                      bn_ctx=bn_ctx, path=f"{path}.2")


def forward_features(
    params, spec: ModelSpec, x, compute_dtype=jnp.float32, bn_ctx=None
) -> List[jnp.ndarray]:
    """Run the graph up to (but not including) the final head; returns saved feats."""
    feats: List[Optional[jnp.ndarray]] = []
    y = x
    for idx, layer in enumerate(spec.layers):
        p = params[idx]
        path = str(idx)
        if layer.kind == "conv":
            y = conv_block(p, y, stride=layer.s, compute_dtype=compute_dtype,
                           bn_ctx=bn_ctx, path=path)
        elif layer.kind == "c2f":
            y = c2f_block(p, y, layer.n, layer.shortcut, compute_dtype, bn_ctx, path)
        elif layer.kind == "sppf":
            y = sppf_block(p, y, layer.k, compute_dtype, bn_ctx, path)
        elif layer.kind == "upsample":
            y = _upsample2x(y)
        elif layer.kind == "concat":
            y = jnp.concatenate([y, feats[layer.src[1]]], axis=-1)
        elif layer.kind in ("classify", "detect"):
            feats.append(y)
            return feats  # head handled by callers
        feats.append(y)
    return feats


def forward_classify(params, spec: ModelSpec, x, compute_dtype=jnp.float32, bn_ctx=None):
    """x: (N, H, W, 3) float in [0,1] RGB -> logits (N, nc)."""
    feats = forward_features(params, spec, x, compute_dtype, bn_ctx)
    head_idx = len(spec.layers) - 1
    return classify_head(params[head_idx], feats[-1], compute_dtype, bn_ctx, str(head_idx))


def forward_detect_raw(
    params, spec: ModelSpec, x, compute_dtype=jnp.float32, bn_ctx=None
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """x: (N, H, W, 3) -> per-level (box_dist (N,h,w,64), cls_logit (N,h,w,nc))."""
    feats = forward_features(params, spec, x, compute_dtype, bn_ctx)
    head_idx = len(spec.layers) - 1
    det = params[head_idx]
    out = []
    for i, src in enumerate(spec.layers[-1].src):
        f = feats[src]
        box = _detect_branch(det["box"][i], f, compute_dtype, bn_ctx, f"{head_idx}.box.{i}")
        cls = _detect_branch(det["cls"][i], f, compute_dtype, bn_ctx, f"{head_idx}.cls.{i}")
        out.append((box, cls))
    return out


def flops_per_image(spec: ModelSpec, imgsz: int) -> int:
    """Analytic matmul/conv FLOPs (2*MACs) of one forward at ``imgsz``.

    Counts every conv and the classify linear; elementwise/pool/BN/SiLU are
    omitted (they are bandwidth-, not FLOP-bound). Padding-excluded like
    XLA's cost model (taps falling on zero padding are not MACs — at tiny
    spatial sizes that is a real fraction). Validated against XLA's own
    ``cost_analysis`` in tests/test_detector.py. Used by bench.py to report
    achieved TFLOP/s and MFU against the chip peak."""

    def taps(h: int, k: int, s: int) -> int:
        # sum over 'same'-padded output positions of in-bounds kernel taps
        # along one dimension (separable: total taps = taps_h * taps_w)
        p = k // 2
        return sum(
            min(o * s - p + k, h) - max(o * s - p, 0) for o in range(h // s)
        )

    def conv(h, w, cin, cout, k, s):
        return 2 * cin * cout * taps(h, k, s) * taps(w, k, s)

    total = 0
    sizes: List[Tuple[int, int]] = []  # per-layer output (h, w)
    h = w = imgsz
    for li, layer in enumerate(spec.layers):
        if layer.kind == "conv":
            total += conv(h, w, layer.cin, layer.cout, layer.k, layer.s)
            h, w = h // layer.s, w // layer.s
        elif layer.kind == "c2f":
            c = layer.cout // 2
            total += conv(h, w, layer.cin, 2 * c, 1, 1)
            total += layer.n * 2 * conv(h, w, c, c, 3, 1)
            total += conv(h, w, (2 + layer.n) * c, layer.cout, 1, 1)
        elif layer.kind == "sppf":
            c_ = layer.cin // 2
            total += conv(h, w, layer.cin, c_, 1, 1)
            total += conv(h, w, 4 * c_, layer.cout, 1, 1)
        elif layer.kind == "upsample":
            h, w = h * 2, w * 2
        elif layer.kind == "concat":
            # restore the lateral source's spatial size (FPN/PAN joins are
            # always at the lateral's resolution in this graph)
            h, w = sizes[layer.src[1]]
        elif layer.kind == "classify":
            total += conv(h, w, layer.cin, 1280, 1, 1)
            total += 2 * 1280 * layer.cout
        elif layer.kind == "detect":
            c2 = max(16, spec.out_channels[0] // 4, REG_MAX * 4)
            c3 = max(spec.out_channels[0], min(spec.nc, 100))
            for src, cin, s in zip(layer.src, spec.out_channels, spec.strides):
                hh, ww = sizes[src]
                total += conv(hh, ww, cin, c2, 3, 1) + conv(hh, ww, c2, c2, 3, 1)
                total += conv(hh, ww, c2, 4 * REG_MAX, 1, 1)
                total += conv(hh, ww, cin, c3, 3, 1) + conv(hh, ww, c3, c3, 3, 1)
                total += conv(hh, ww, c3, spec.nc, 1, 1)
        sizes.append((h, w))
    return int(total)


def dfl_decode(box_dist: jnp.ndarray) -> jnp.ndarray:
    """Distribution Focal Loss decode: (..., 4*REG_MAX) -> (..., 4) expected offsets."""
    shape = box_dist.shape[:-1]
    d = box_dist.reshape(shape + (4, REG_MAX))
    p = jax.nn.softmax(d, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=p.dtype)
    return jnp.sum(p * bins, axis=-1)


def make_anchors(
    img_hw: Tuple[int, int], strides: Sequence[int], offset: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor points (cell centers, units of stride) and per-anchor stride.

    Matches the semantics of ultralytics' anchor grid: for each level, points
    at (x+0.5, y+0.5) for every cell; concatenated over levels.
    """
    pts, strs = [], []
    H, W = img_hw
    for s in strides:
        h, w = H // s, W // s
        xs = (np.arange(w, dtype=np.float32) + offset)
        ys = (np.arange(h, dtype=np.float32) + offset)
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(np.full((h * w, 1), s, dtype=np.float32))
    return np.concatenate(pts, 0), np.concatenate(strs, 0)


def decode_boxes(
    raw: List[Tuple[jnp.ndarray, jnp.ndarray]],
    img_hw: Tuple[int, int],
    strides: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode raw head outputs into (boxes_xyxy (N,A,4) pixels, scores (N,A,nc))."""
    anchors, astr = make_anchors(img_hw, strides)
    anchors = jnp.asarray(anchors)
    astr = jnp.asarray(astr)
    dists, clss = [], []
    for (box, cls) in raw:
        n, h, w, _ = box.shape
        dists.append(box.reshape(n, h * w, 4 * REG_MAX))
        clss.append(cls.reshape(n, h * w, cls.shape[-1]))
    dist = jnp.concatenate(dists, axis=1)
    cls = jnp.concatenate(clss, axis=1)
    ltrb = dfl_decode(dist)  # (N, A, 4) in stride units
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = (anchors[None] - lt) * astr[None]
    x2y2 = (anchors[None] + rb) * astr[None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores = jax.nn.sigmoid(cls)
    return boxes, scores

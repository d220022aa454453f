"""Weight quantization for deployment — the TFLite-export equivalent.

The reference's final generation ships a dynamic-range-quantized TFLite
flatbuffer (tf_lite_version/model_neural.py:180-187: int8 weights,
float compute). The TPU-native analogue: per-channel symmetric int8
weight quantization with on-the-fly dequantization into bf16/f32 compute.
Checkpoints shrink ~4x; XLA folds the dequant scale into the conv, so the
runtime graph is unchanged except weights stream from HBM as int8.

``quantize_variables`` / ``dequantize_variables`` round-trip a Flax
variables pytree; ``quantized_size_bytes`` reports the deployment payload.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_variables",
    "dequantize_variables",
    "quantized_size_bytes",
    "quantization_error",
    "save_quantized",
    "load_quantized",
    "calibrate_act_scales",
    "fold_batchnorm",
]

_MIN_QUANT_SIZE = 64  # leave tiny tensors (biases, BN) in float


def _quantize_leaf(w: jnp.ndarray):
    if w.ndim < 2 or w.size < _MIN_QUANT_SIZE:
        return w  # float passthrough
    # Per-output-channel scales (last axis of Flax conv kernels).
    axes = tuple(range(w.ndim - 1))
    scale = jnp.max(jnp.abs(w), axis=axes, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def _dequantize_leaf(leaf, dtype=jnp.float32):
    if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
        return (leaf["q"].astype(jnp.float32) * leaf["scale"]).astype(dtype)
    return leaf


def quantize_variables(variables: Any) -> Any:
    """Quantize every large >=2-D weight in a variables pytree to int8 with
    per-channel scales; small tensors and batch stats stay float."""
    return jax.tree_util.tree_map(_quantize_leaf, variables)


def dequantize_variables(qvariables: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_variables` (scales folded back in)."""
    return jax.tree_util.tree_map(
        _dequantize_leaf,
        qvariables,
        is_leaf=lambda x: isinstance(x, dict) and set(x) == {"q", "scale"},
    )


def quantized_size_bytes(qvariables: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(qvariables):
        total += np.asarray(leaf).nbytes
    return total


def save_quantized(path, variables: Any) -> int:
    """Quantize a variables pytree and write it as one .npz — the compact
    deployment artifact (the reference's .tflite analogue). Returns bytes
    written. Keys are '/'-joined tree paths."""
    import os

    q = quantize_variables(variables)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) and set(node) == {"q", "scale"}:
            flat[prefix + "/__q__"] = np.asarray(node["q"])
            flat[prefix + "/__scale__"] = np.asarray(node["scale"])
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", q)
    path = os.fspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **flat)
    return os.path.getsize(path)


def load_quantized(path, dtype=jnp.float32) -> Any:
    """Load a save_quantized artifact back into a dequantized float
    variables pytree ready for model.apply."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        if parts[-1] in ("__q__", "__scale__"):
            node_parts, leaf = parts[:-1], parts[-1]
        else:
            node_parts, leaf = parts[:-1], parts[-1]
        cur = tree
        for p in node_parts:
            cur = cur.setdefault(p, {})
        if leaf == "__q__":
            cur.setdefault("__qpair__", {})["q"] = data[key]
        elif leaf == "__scale__":
            cur.setdefault("__qpair__", {})["scale"] = data[key]
        else:
            cur[leaf] = jnp.asarray(data[key])

    def resolve(node):
        if isinstance(node, dict):
            if set(node) == {"__qpair__"}:
                pair = node["__qpair__"]
                return (jnp.asarray(pair["q"]).astype(jnp.float32)
                        * jnp.asarray(pair["scale"])).astype(dtype)
            return {k: resolve(v) for k, v in node.items()}
        return node

    return resolve(tree)


def calibrate_act_scales(model, variables: Any, batches) -> Any:
    """Post-training activation-scale calibration for int8 serving.

    Runs the ``quant=True`` model over the calibration ``batches``
    (an iterable of feature arrays) with the ``quant_stats`` collection
    mutable, so every :class:`azoom.models.unet.QConv` records the running
    max-abs of its input. Returns ``variables`` extended with the
    resulting ``quant_stats`` collection; serving with those variables
    uses the static scales (no per-call full-tensor reduction — the hot
    path becomes quantize -> int8 conv -> dequantize only). This is the
    TPU analogue of TFLite's representative-dataset calibration
    (tf_lite_version/model_neural.py:180-187 ships dynamic-range quant;
    full-integer TFLite calibration is this step).
    """
    import functools

    # One compiled program per batch shape (the calibration apply is pure);
    # eager per-op dispatch is prohibitively slow on remote backends.
    calib_apply = jax.jit(
        functools.partial(model.apply, mutable=["quant_stats"])
    )
    qs = variables.get("quant_stats", {})
    for feats in batches:
        v = {**variables, "quant_stats": qs} if qs else dict(variables)
        _, mut = calib_apply(v, feats)
        qs = mut["quant_stats"]
    if not qs:
        raise ValueError(
            "no quant_stats recorded — is the model built with quant=True?"
        )
    return {**variables, "quant_stats": qs}


_BN_EPS = 1e-5  # flax nn.BatchNorm default (none of the nets override it)


def fold_batchnorm(variables: Any) -> Any:
    """Serving-time BatchNorm folding: absorb every Conv->BN pair into the
    conv's kernel/bias and leave the BN an exact identity.

    At inference BN(y) = gamma * (y - mean) / sqrt(var + eps) + beta is a
    per-channel affine, so with s = gamma / sqrt(var + eps):

        kernel'[..., c] = kernel[..., c] * s[c]
        bias'[c]        = (bias[c] - mean[c]) * s[c] + beta[c]

    computes Conv->BN in the conv itself; the BN site is rewritten to
    gamma=1, beta=0, mean=0, var=1-eps (exactly identity), which XLA
    constant-folds away. For the int8 path (:class:`QConv`) the fold is
    free of quantization cost: weight scales are per-output-channel
    symmetric, so scaling a channel by s rescales its w_scale identically
    and the int8 codes are bit-identical (only the dequant scale/bias
    change) — this is the TFLite-converter BN fold, done on the variables
    pytree instead of a flatbuffer (tf_lite_version/model_neural.py:
    180-187 ships its nets through exactly that converter pass).

    Pairing rule: within one module's params dict, ``Conv_i`` /
    ``BatchNorm_i`` with matching channel counts (ConvBNRelu and ResBlock
    lay their children out this way). Returns new variables; inference
    outputs are identical to ~1e-6. Fine-tuning folded variables would
    re-learn BN from an identity restart — fold for serving only.
    """
    def plain(t):
        if hasattr(t, "items"):  # dict or FrozenDict
            return {k: plain(v) for k, v in t.items()}
        return np.asarray(t)

    params = plain(variables["params"])
    stats = plain(variables.get("batch_stats", {}))

    def walk(p: dict, s: dict):
        for name in list(p):
            if not name.startswith("Conv_"):
                continue
            bn = "BatchNorm_" + name.split("_")[1]
            if bn not in p or bn not in s:
                continue
            conv, bnp, bns = p[name], p[bn], s[bn]
            if "kernel" not in conv or "bias" not in conv or conv["kernel"].ndim < 2:
                continue
            cout = conv["kernel"].shape[-1]
            if bns["mean"].shape[-1] != cout:
                continue
            scale = bnp["scale"] / np.sqrt(bns["var"] + _BN_EPS)
            conv["kernel"] = conv["kernel"] * scale
            conv["bias"] = (conv["bias"] - bns["mean"]) * scale + bnp["bias"]
            bnp["scale"] = np.ones_like(bnp["scale"])
            bnp["bias"] = np.zeros_like(bnp["bias"])
            bns["mean"] = np.zeros_like(bns["mean"])
            bns["var"] = np.full_like(bns["var"], 1.0 - _BN_EPS)
        for name, child in p.items():
            if isinstance(child, dict) and isinstance(s.get(name), dict):
                walk(child, s[name])

    walk(params, stats)
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    out = dict(variables)
    out["params"] = to_jnp(params)
    if stats:
        out["batch_stats"] = to_jnp(stats)
    return out


def quantization_error(variables: Any, qvariables: Any) -> float:
    """Max relative weight error introduced by quantization (sanity bound:
    < 1/127 per channel by construction)."""
    orig = jax.tree_util.tree_leaves(variables)
    deq = jax.tree_util.tree_leaves(dequantize_variables(qvariables))
    worst = 0.0
    for o, d in zip(orig, deq):
        o = jnp.asarray(o)
        denom = jnp.max(jnp.abs(o)) + 1e-12
        worst = max(worst, float(jnp.max(jnp.abs(o - d)) / denom))
    return worst

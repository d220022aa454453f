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

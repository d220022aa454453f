"""Frequency-preserving U-Net mask estimators (Flax).

TPU-native re-designs of the reference's three mask-estimator generations:

  * ``FreqPreservingUNet`` — 3-level U-Net whose pooling/upsampling touch
    ONLY the time axis so frequency resolution is never lost
    (full_audio_generating_pipeline/model_training.py:95-136).
  * ``DeepFPU`` — the same skeleton deepened with residual blocks: 4
    encoder levels + 512-channel bottleneck with two ResBlocks
    (resnet_model_mvdr/inference.py:38-137; Keras twin
    tf_lite_version/model_neural.py:97-152).

Design differences from the reference (deliberate, TPU-first):
  * channels-LAST (B, F, T, C) layout — XLA's native TPU conv layout; the
    torch originals are NCHW.
  * ``dtype`` parameter for bfloat16 activations (params stay float32) —
    convs land on the MXU at full throughput.
  * inputs are padded to a multiple of 2^depth time frames by the caller
    (``pad_frames``) so every shape is static under jit; the reference
    instead patches mismatches with nearest interpolation at runtime
    (``_match``, model_training.py:119-122).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["FreqPreservingUNet", "DeepFPU", "pad_frames", "time_pool_factor"]


def time_pool_factor(depth: int) -> int:
    """Total time-axis downsampling of a depth-level U-Net."""
    return 2**depth


def pad_frames(x: jnp.ndarray, multiple: int, axis: int = -2) -> tuple[jnp.ndarray, int]:
    """Zero-pad the time axis (default: axis -2 of (..., F, T, C)) to a
    multiple; returns (padded, original_length)."""
    t = x.shape[axis]
    pad = (-t) % multiple
    if pad == 0:
        return x, t
    widths = [(0, 0)] * x.ndim
    widths[axis % x.ndim] = (0, pad)
    return jnp.pad(x, widths), t


class ConvBNRelu(nn.Module):
    """Conv 3x3 -> BatchNorm -> ReLU (the reference's basic cell)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    """Two ConvBNRelu cells (model_training.py:113-117 ``_conv``)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.features, self.dtype)(x, train)
        return ConvBNRelu(self.features, self.dtype)(x, train)


class ResBlock(nn.Module):
    """Residual block: x + BN(Conv(ReLU(BN(Conv(x))))), then ReLU
    (resnet_model_mvdr/inference.py:38-51)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        return nn.relu(x + h)


def _pool_time(x):
    """MaxPool (1, 2): halve the time axis only."""
    return nn.max_pool(x, window_shape=(1, 2), strides=(1, 2))


def _up_time(x, features, dtype):
    """ConvTranspose (1, 2) stride (1, 2): double the time axis only."""
    return nn.ConvTranspose(features, (1, 2), strides=(1, 2), dtype=dtype)(x)


class FreqPreservingUNet(nn.Module):
    """3-level frequency-preserving U-Net -> sigmoid mask.

    Input (B, F, T, C) with T % 8 == 0; output (B, F, T).
    """

    base: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        e1 = DoubleConv(self.base, d)(x, train)
        e2 = DoubleConv(self.base * 2, d)(_pool_time(e1), train)
        e3 = DoubleConv(self.base * 4, d)(_pool_time(e2), train)
        b = DoubleConv(self.base * 8, d)(_pool_time(e3), train)

        u3 = _up_time(b, self.base * 4, d)
        d3 = DoubleConv(self.base * 4, d)(jnp.concatenate([u3, e3], -1), train)
        u2 = _up_time(d3, self.base * 2, d)
        d2 = DoubleConv(self.base * 2, d)(jnp.concatenate([u2, e2], -1), train)
        u1 = _up_time(d2, self.base, d)
        d1 = DoubleConv(self.base, d)(jnp.concatenate([u1, e1], -1), train)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(d1.astype(jnp.float32))
        return nn.sigmoid(out)[..., 0]


class DeepFPU(nn.Module):
    """4-level residual frequency-preserving U-Net -> sigmoid mask.

    Input (B, F, T, C) with T % 16 == 0; output (B, F, T). ``in_channels``
    is inferred from the input; use C=2 (gen 3) or C=4 physics-aware (gen 4).
    """

    base: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)

        def enc_level(h, feats, first=False):
            if first:
                return DoubleConv(feats, d)(h, train)
            h = ConvBNRelu(feats, d)(h, train)
            return ResBlock(feats, d)(h, train)

        e1 = enc_level(x, self.base, first=True)
        e2 = enc_level(_pool_time(e1), self.base * 2)
        e3 = enc_level(_pool_time(e2), self.base * 4)
        e4 = enc_level(_pool_time(e3), self.base * 8)

        b = ConvBNRelu(self.base * 16, d)(_pool_time(e4), train)
        b = ResBlock(self.base * 16, d)(b, train)
        b = ResBlock(self.base * 16, d)(b, train)

        def dec_level(h, skip, feats, last=False):
            h = _up_time(h, feats, d)
            h = jnp.concatenate([h, skip], -1)
            if last:
                return DoubleConv(feats, d)(h, train)
            h = ConvBNRelu(feats, d)(h, train)
            return ResBlock(feats, d)(h, train)

        h = dec_level(b, e4, self.base * 8)
        h = dec_level(h, e3, self.base * 4)
        h = dec_level(h, e2, self.base * 2)
        h = dec_level(h, e1, self.base, last=True)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(h.astype(jnp.float32))
        return nn.sigmoid(out)[..., 0]

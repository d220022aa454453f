"""Quaternion-CNN mask estimator — the reference roadmap's "Q-CNN" model
family (reference TODO:6 "Add model usage options (RNN-BLSTM, CNN,
PINN-CNN, Q-CNN etc)"; no reference implementation exists).

The physics features are a natural quaternion field: every TF bin carries
[log|Y0|, sin(IPD), cos(IPD), freq-map] (masks/features.py:75-76) — one
4-component hypercomplex number whose parts are physically entangled
(sin/cos of the same phase, magnitude, and the frequency that scales that
phase). A quaternion convolution mixes channels through the Hamilton
product, so the four components share one set of weights viewed through
the quaternion algebra's rotation structure: 4x fewer channel-mixing
parameters than a real conv of equal width, and cross-component
couplings (e.g. sin<->cos) are first-class instead of learned from
scratch.

TPU-first realization: the Hamilton product is *linear* in the input, so
a quaternion conv is exactly a real convolution whose (4Ci, 4Co) mixing
matrix has the 4x4 Hamilton block structure. We assemble that kernel at
trace time from the four free kernels (wr, wx, wy, wz) with stacks and
one reshape — constants to XLA — and emit ONE ordinary conv per layer,
so the whole net runs on the MXU exactly like the real-valued U-Nets
(no gather/scatter, no per-component lax ops). Channel layout is
interleaved (quaternion q occupies channels 4q..4q+3), which makes skip
concatenation quaternion-preserving for free.

Like the BLSTM family this ships architecture-parity-tested with no
bundled artifact; the equal-budget head-to-head against the real CNN and
the PINN-CNN loss axis is scripts/train_qcnn_study.py (findings in
RESULTS.md "Q-CNN / PINN-CNN").
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from azoom.models.unet import _pool_time

__all__ = ["QuaternionConv", "QCNNMaskNet"]


class QuaternionConv(nn.Module):
    """Quaternion 2-D convolution: (B, F, T, 4*Ci) -> (B, F, T, 4*Co).

    ``features`` counts QUATERNION output channels (4*features real
    channels). Channels are interleaved: quaternion q's (r, i, j, k)
    components live at real channels 4q..4q+3. Weights follow the
    left Hamilton product w (x) q; the fan-in-preserving init scales
    variance by 1/4 because each output component sums contributions
    from all four kernels.
    """

    features: int
    kernel: tuple[int, int] = (3, 3)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        if c_in % 4:
            raise ValueError(f"quaternion input needs 4k channels, got {c_in}")
        ci, co = c_in // 4, self.features
        kh, kw = self.kernel
        init = nn.initializers.variance_scaling(
            0.25, "fan_in", "truncated_normal"
        )
        wr = self.param("wr", init, (kh, kw, ci, co), self.dtype)
        wx = self.param("wx", init, (kh, kw, ci, co), self.dtype)
        wy = self.param("wy", init, (kh, kw, ci, co), self.dtype)
        wz = self.param("wz", init, (kh, kw, ci, co), self.dtype)

        # Hamilton block table: rows = input component (r,i,j,k), cols =
        # output component. Row a, col b = coefficient multiplying input
        # component a in output component b of w (x) q.
        rows = (
            (wr, wx, wy, wz),
            (-wx, wr, wz, -wy),
            (-wy, -wz, wr, wx),
            (-wz, wy, -wx, wr),
        )
        # (kh, kw, ci, co, 4in, 4out) -> interleave -> (kh, kw, 4ci, 4co)
        blocks = jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )
        kern = jnp.transpose(blocks, (0, 1, 2, 4, 3, 5)).reshape(
            kh, kw, 4 * ci, 4 * co
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (4 * co,), self.dtype)
            y = y + b
        return y


class _QDoubleConv(nn.Module):
    """Two quaternion 3x3 convs, each followed by BatchNorm + ReLU.

    BatchNorm runs per real channel (the "split" quaternion-BN variant) —
    whitening the four components jointly would need a 4x4 matrix sqrt
    per channel for no measured benefit at this scale.
    """

    features: int  # quaternion channels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = QuaternionConv(self.features, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


def _q_up_time(x: jnp.ndarray, features: int, dtype) -> jnp.ndarray:
    """2x time upsample (nearest) + quaternion (1,3) conv — the mixing
    stays in the quaternion algebra all the way to the head."""
    x = jnp.repeat(x, 2, axis=-2)
    return QuaternionConv(features, kernel=(1, 3), dtype=dtype)(x)


class QCNNMaskNet(nn.Module):
    """Quaternion frequency-preserving U-Net -> sigmoid mask.

    Reads the 4-channel physics features (one quaternion per TF bin,
    feature_kind='physics'); input (B, F, T, 4) with T % 8 == 0, output
    (B, F, T). Mirrors FreqPreservingUNet's time-only pooling skeleton
    (model_training.py:95-136's invariant: frequency resolution is never
    lost) with all channel mixing through Hamilton-structured convs; the
    head is one real 1x1 conv over the final quaternion block.

    ``base`` counts quaternion channels: base=8 gives the real-channel
    widths of FreqPreservingUNet(base=32) at ~1/4 the mixing parameters.
    """

    base: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != 4:
            raise ValueError(
                "QCNNMaskNet reads the 4-channel physics features "
                f"(one quaternion per bin); got C={x.shape[-1]}"
            )
        d = self.dtype
        x = x.astype(d)
        e1 = _QDoubleConv(self.base, d)(x, train)
        e2 = _QDoubleConv(self.base * 2, d)(_pool_time(e1), train)
        e3 = _QDoubleConv(self.base * 4, d)(_pool_time(e2), train)
        b = _QDoubleConv(self.base * 8, d)(_pool_time(e3), train)

        u3 = _q_up_time(b, self.base * 4, d)
        d3 = _QDoubleConv(self.base * 4, d)(jnp.concatenate([u3, e3], -1), train)
        u2 = _q_up_time(d3, self.base * 2, d)
        d2 = _QDoubleConv(self.base * 2, d)(jnp.concatenate([u2, e2], -1), train)
        u1 = _q_up_time(d2, self.base, d)
        d1 = _QDoubleConv(self.base, d)(jnp.concatenate([u1, e1], -1), train)

        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(d1.astype(jnp.float32))
        return nn.sigmoid(out)[..., 0]

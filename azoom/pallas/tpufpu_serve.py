"""TPUFPU serving forward on the fused int8 Pallas conv kernel.

A functional mirror of ``azoom.models.unet.TPUFPU.__call__`` (inference
mode, ``quant=True``) that routes every 3x3 conv through
:func:`azoom.pallas.qconv_kernel.qconv3x3_pallas` — the im2col-in-VMEM
int8 MXU kernel — while pooling, upsampling, skip concats and the 1x1
head stay XLA (they are ~0 % of the step; RESULTS.md round-3 profile).

Walks the *same* variables pytree the Flax model uses (params +
batch_stats + calibrated quant_stats); upsampling and the head apply the
actual Flax modules with extracted sub-trees, guaranteeing layout
parity. Architecture drift between this mirror and the Flax definition
is guarded by tests/test_qconv_pallas.py::test_tpufpu_serve_parity.

Scope: the mirror covers the classic TPUFPU tree (any ``base``/``fold``/
``bneck``; ``dec_div``/``enc_div``/``tfold`` = 1) — the architecture the
kernel study was run on. The width/grid knobs landed after the study
concluded the fused kernel is 4.7x slower than XLA end-to-end
(RESULTS.md), so the mirror is kept as parity-tested infrastructure for
the legacy tree rather than chasing the flagship's; it raises a clear
error for the newer knobs instead of mis-applying hardcoded widths.

Serving only (like QConv itself): requires the ``quant_stats`` collection
from azoom.models.quantize.calibrate_act_scales.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from azoom.models.unet import fold_freq, unfold_freq
from azoom.pallas.qconv_kernel import qconv3x3_pallas

__all__ = ["tpufpu_apply_pallas"]


def tpufpu_apply_pallas(
    model, variables: Any, x: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """(B, F, T, C) features -> (B, F, T) mask, TPUFPU weights, fused convs.

    ``model`` is the TPUFPU instance (supplies base/fold/dtype); the
    compute path ignores its ``quant`` flag and always serves int8.
    """
    if "quant_stats" not in variables:
        raise ValueError(
            "tpufpu_apply_pallas needs calibrated static activation scales "
            "(variables['quant_stats']); run "
            "azoom.models.quantize.calibrate_act_scales first"
        )
    if (getattr(model, "dec_div", 1), getattr(model, "enc_div", 1),
            getattr(model, "tfold", 1)) != (1, 1, 1):
        raise ValueError(
            "tpufpu_apply_pallas mirrors the classic TPUFPU tree only "
            "(dec_div=enc_div=tfold=1); the slim/nano width knobs serve "
            "through the XLA path, which is faster anyway (the fused "
            "kernel is a documented negative result, RESULTS.md)"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    q = variables["quant_stats"]
    d = model.dtype
    fold = model.fold

    def cbr(name, h, scope=None):
        """ConvBNRelu cell: fused conv + BN affine + ReLU."""
        pp, ss, qq = (
            (p[scope][name], s[scope][name], q[scope][name])
            if scope else (p[name], s[name], q[name])
        )
        c, b, st = pp["Conv_0"], pp["BatchNorm_0"], ss["BatchNorm_0"]
        return qconv3x3_pallas(
            h, c["kernel"], c["bias"], qq["Conv_0"]["act_scale"],
            bn=(b["scale"], b["bias"], st["mean"], st["var"]),
            relu=True, out_dtype=d, interpret=interpret,
        )

    def res(name, h):
        """ResBlock: relu(x + BN(conv1(relu(BN(conv0(x))))))."""
        pp, ss, qq = p[name], s[name], q[name]
        c0, b0, st0 = pp["Conv_0"], pp["BatchNorm_0"], ss["BatchNorm_0"]
        g = qconv3x3_pallas(
            h, c0["kernel"], c0["bias"], qq["Conv_0"]["act_scale"],
            bn=(b0["scale"], b0["bias"], st0["mean"], st0["var"]),
            relu=True, out_dtype=d, interpret=interpret,
        )
        c1, b1, st1 = pp["Conv_1"], pp["BatchNorm_1"], ss["BatchNorm_1"]
        return qconv3x3_pallas(
            g, c1["kernel"], c1["bias"], qq["Conv_1"]["act_scale"],
            bn=(b1["scale"], b1["bias"], st1["mean"], st1["var"]),
            residual=h, relu=True, out_dtype=d, interpret=interpret,
        )

    def double(scope, h):
        h = cbr("ConvBNRelu_0", h, scope)
        return cbr("ConvBNRelu_1", h, scope)

    def pool(h):
        return nn.max_pool(h, window_shape=(1, 2), strides=(1, 2))

    def up(name, h, feats):
        return nn.ConvTranspose(
            feats, (1, 2), strides=(1, 2), dtype=d
        ).apply({"params": p[name]}, h)

    F = x.shape[-3]
    base = model.base
    h = fold_freq(x, fold).astype(d)

    e1 = double("DoubleConv_0", h)
    e2 = res("ResBlock_0", cbr("ConvBNRelu_0", pool(e1)))
    e3 = res("ResBlock_1", cbr("ConvBNRelu_1", pool(e2)))
    b = res("ResBlock_3", res("ResBlock_2", cbr("ConvBNRelu_2", pool(e3))))

    h = jnp.concatenate([up("ConvTranspose_0", b, base * 4), e3], -1)
    h = res("ResBlock_4", cbr("ConvBNRelu_3", h))
    h = jnp.concatenate([up("ConvTranspose_1", h, base * 2), e2], -1)
    h = res("ResBlock_5", cbr("ConvBNRelu_4", h))
    h = jnp.concatenate([up("ConvTranspose_2", h, base), e1], -1)
    h = double("DoubleConv_1", h)

    out = nn.Conv(fold, (1, 1), dtype=jnp.float32).apply(
        {"params": p["Conv_0"]}, h.astype(jnp.float32)
    )
    return jax.nn.sigmoid(unfold_freq(out, fold, F))

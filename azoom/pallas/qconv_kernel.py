"""Fused int8 3x3 conv Pallas TPU kernel — the mask-net serving hot op.

Motivation (measured, RESULTS.md round 3): the TPUFPU int8 serving step is
~80 % mask net, and XLA lowers `lax.conv_general_dilated` with int8
operands at only ~44-56 % of the v5e int8-MXU peak at these shapes
(129 x {8..64} spatial grids), while plain int8 *matmuls* at the same
arithmetic intensity run far closer to peak. So: turn the conv INTO one
big matmul — im2col built in VMEM (never materialized in HBM), one
(rows x 9*Cin) @ (9*Cin x Cout) MXU dot per tile, epilogue (dequant +
bias + folded BN affine + optional residual + ReLU) fused in f32.

Layout trick — "flattened padded plane": SAME 3x3 conv neighbourhoods
become *row offsets* after zero-padding the (F, T) grid by 1 on each side
and flattening to rows = (F+2)*(T+2):

    out[g] = sum_{dy,dx} W[dy,dx] . x[g + dy*(T+2) + dx]

Interior rows are exact (padded cells hold zeros, exactly SAME conv
semantics); border rows compute garbage and are cropped by the wrapper.
Guard bands of G = T+3 zero rows above and below keep every tap slice in
bounds, so the kernel is 9 *static* sublane slices of one quantized
VMEM scratch buffer + one dot — no dynamic gathers, no HBM im2col.

Quantization semantics match azoom.models.unet.QConv exactly (per-output-
channel symmetric int8 weights, static percentile-calibrated activation
scale): the int8 codes are bit-identical; only the epilogue order differs
(single f32 fused affine vs QConv's bf16 round-trip through BatchNorm), a
~1-ulp-bf16 difference (tests/test_qconv_pallas.py bounds it).

No reference counterpart: the reference's conv stack is torch/cuDNN
(resnet_model_mvdr/inference.py:38-137); this is the TPU-native serving
path for the same layer family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qconv3x3_pallas"]

_BN_EPS = 1e-5  # flax nn.BatchNorm default (matches azoom.models.quantize)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(n_taps_offsets, relu, has_res, x_ref, w_ref, sc_ref, bi_ref,
            *rest):
    """One (row-tile, batch) step: quantize slice -> im2col -> dot -> epilogue.

    x_ref:  (1, Ntot, Cin) bf16/f32 — full guarded plane of this image
    w_ref:  (9*Cin, Cout) int8 — tap-major im2col weights
    sc_ref: (1, Cout) f32 — fused dequant scale (act_scale * w_scale * bn)
    bi_ref: (1, Cout) f32 — fused bias
    rest:   [res_ref (1, R, Cout)]? , s_ref (1,1) f32 SMEM (act scale),
            o_ref, xq scratch (R+2G, Cin) int8, [col scratch (R, 9*Cin)]
    """
    if has_res:
        res_ref, s_ref, o_ref, xq, *col = rest
    else:
        s_ref, o_ref, xq, *col = rest
        res_ref = None

    i = pl.program_id(1)
    R = o_ref.shape[1]
    n_rows = xq.shape[0]  # R + 2G
    cin = xq.shape[1]

    # Quantize the guarded row window once (static activation scale —
    # exactly QConv's serving path: clip(round(x / s), -127, 127); true
    # division, not reciprocal-multiply, so the int8 codes are
    # bit-identical to the XLA path).
    start = pl.multiple_of(i * R, R)
    xf = x_ref[0, pl.ds(start, n_rows), :].astype(jnp.float32)
    xq[:] = jnp.clip(
        jnp.round(xf / s_ref[0, 0]), -127, 127
    ).astype(jnp.int8)

    if col:
        # im2col in VMEM: 9 static sublane slices, tap-major columns,
        # then ONE (R x 9*Cin) @ (9*Cin x Cout) MXU dot. Requires
        # Cin % 128 == 0 so the column writes are lane-aligned.
        col = col[0]
        for t, local_start in enumerate(n_taps_offsets):
            col[:, t * cin:(t + 1) * cin] = xq[local_start:local_start + R, :]
        acc = jax.lax.dot_general(
            col[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        # Narrow-channel levels (Cin < 128): lane-offset im2col writes
        # would be unaligned, so accumulate 9 tap dots instead (all
        # slices land on the sublane axis, which tolerates any offset).
        acc = None
        for t, local_start in enumerate(n_taps_offsets):
            part = jax.lax.dot_general(
                xq[local_start:local_start + R, :],
                w_ref[t * cin:(t + 1) * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
    y = acc.astype(jnp.float32) * sc_ref[0, :][None, :] + bi_ref[0, :][None, :]
    if res_ref is not None:
        y = y + res_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _pad_plane(x: jnp.ndarray, guard: int, np_pad: int) -> jnp.ndarray:
    """(B, F, T, C) -> (B, Ntot, C) guarded flattened padded plane."""
    B, F, T, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = xp.reshape(B, (F + 2) * (T + 2), C)
    return jnp.pad(
        flat, ((0, 0), (guard, np_pad - flat.shape[1] + guard), (0, 0))
    )


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_dtype", "block_rows", "interpret"),
)
def qconv3x3_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    act_scale: jnp.ndarray,
    bn: tuple | None = None,
    residual: jnp.ndarray | None = None,
    relu: bool = True,
    out_dtype=jnp.bfloat16,
    block_rows: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused serving-path Conv3x3(SAME, int8) [+BN affine] [+residual] [+ReLU].

    Args:
      x: (B, F, T, Cin) float32/bf16 pre-activation input (unquantized).
      kernel: (3, 3, Cin, Cout) float32 conv weights (quantized per-output-
        channel inside, identical codes to QConv).
      bias: (Cout,) conv bias.
      act_scale: scalar static activation scale (the calibrated
        quant_stats/act_scale of this conv).
      bn: optional (gamma, beta, mean, var) inference-mode BatchNorm,
        folded into the dequant scale/bias at trace time (exact affine).
      residual: optional (B, F, T, Cout) added before the final ReLU
        (ResBlock tail: relu(x + BN(conv(h)))).
      relu: apply ReLU in the epilogue.

    Returns (B, F, T, Cout) in ``out_dtype``. Epilogue runs in f32 with a
    single rounding to ``out_dtype`` (QConv+BN round through bf16 twice;
    difference is ~1 ulp bf16 — see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, F, T, cin = x.shape
    cout = kernel.shape[-1]

    # --- weights: QConv's exact per-output-channel symmetric int8 ---
    kf = kernel.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0
    w_scale = jnp.where(w_scale == 0, 1.0, w_scale)
    w_q = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)
    # tap-major im2col layout: (3, 3, Cin, Cout) -> (9*Cin, Cout)
    w_col = w_q.reshape(9 * cin, cout)

    # --- fused dequant scale / bias (+ BatchNorm affine) ---
    act_scale = jnp.asarray(act_scale, jnp.float32)
    eff_scale = act_scale * w_scale
    eff_bias = bias.astype(jnp.float32)
    if bn is not None:
        gamma, beta, mean, var = (jnp.asarray(t, jnp.float32) for t in bn)
        s = gamma * jax.lax.rsqrt(var + _BN_EPS)
        eff_scale = eff_scale * s
        eff_bias = (eff_bias - mean) * s + beta

    # --- guarded flattened plane ---
    G = T + 3                      # max |tap offset| = (T+2) + 1
    Np = (F + 2) * (T + 2)
    R = min(block_rows, _round_up(Np, 256))
    np_pad = _round_up(Np, R)
    n_tiles = np_pad // R
    xg = _pad_plane(x, G, np_pad)  # (B, Ntot, Cin)
    ntot = xg.shape[1]

    # local slice starts within the (R + 2G)-row quantized window:
    # guarded row = plane row + G, tap offset = dy*(T+2)+dx in [-G, G]
    offsets = tuple(
        G + dy * (T + 2) + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    )

    # QConv guards the zero-signal case with +1e-30 on the dynamic path
    # only; calibrated scales are strictly positive already.
    sc0 = act_scale.reshape(1, 1)
    in_specs = [
        pl.BlockSpec((1, ntot, cin), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * cin, cout), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xg, w_col, eff_scale.reshape(1, cout), eff_bias.reshape(1, cout)]
    if residual is not None:
        resg = _pad_plane(residual, 0, np_pad)
        in_specs.append(
            pl.BlockSpec((1, R, cout), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(resg)
    in_specs.append(pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(sc0)

    out = pl.pallas_call(
        functools.partial(_kernel, offsets, relu, residual is not None),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, cout), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, np_pad, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((R + 2 * G, cin), jnp.int8)]
        + ([pltpu.VMEM((R, 9 * cin), jnp.int8)] if cin % 128 == 0 else []),
        interpret=interpret,
    )(*args)

    # crop: padded-plane interior only (border rows hold garbage)
    out = out[:, :Np, :].reshape(B, F + 2, T + 2, cout)
    return out[:, 1:F + 1, 1:T + 1, :]

"""Fused hybrid hard-null Pallas TPU kernel.

Companion to azoom.pallas.mvdr_kernel for the Final-generation beamformer
(Final_pipeline/src/inference.py:28-98): per (BLOCK_F, T) VMEM tile it
fuses the interference-covariance reduction, the closed-form 2x2 Hermitian
EVD (principal eigenvector), the constraint solve C^H w = [1, 0], the
condition-number gate with delay-and-sum fallback, and the weight
application — one pass over HBM for the stereo STFT instead of the XLA
path's covariance materialization + re-read.

All arithmetic carries explicit (re, im) planes; the <200 Hz reference-mic
bypass is applied by the wrapper (a trivially fused select).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hard_null_pallas", "hybrid_hard_null_pallas"]

_EPS_NORM = 1e-6
_EPS = 1e-10


def _kernel(cond_thr, y0r, y0i, y1r, y1i, m, d0r, d0i, d1r, d1i, sr, si):
    a0r, a0i = y0r[:], y0i[:]
    a1r, a1i = y1r[:], y1i[:]
    mi = 1.0 - m[:]  # interference mask (inference.py:43)

    # Interference covariance per frequency row.
    norm = jnp.sum(mi, axis=1, keepdims=True) + _EPS_NORM
    R00 = jnp.sum(mi * (a0r * a0r + a0i * a0i), axis=1, keepdims=True) / norm
    R11 = jnp.sum(mi * (a1r * a1r + a1i * a1i), axis=1, keepdims=True) / norm
    R01r = jnp.sum(mi * (a0r * a1r + a0i * a1i), axis=1, keepdims=True) / norm
    R01i = jnp.sum(mi * (a0i * a1r - a0r * a1i), axis=1, keepdims=True) / norm

    # Principal eigenvector of [[R00, R01],[R01*, R11]] (closed form):
    # lam_max = tr/2 + sqrt((R00-R11)^2/4 + |R01|^2); v = (R01, lam - R00)
    # or (lam - R11, R01*) — pick the larger-norm construction per row.
    half_diff = 0.5 * (R00 - R11)
    b2 = R01r * R01r + R01i * R01i
    radius = jnp.sqrt(half_diff * half_diff + b2)
    lam = 0.5 * (R00 + R11) + radius
    v1r, v1i = R01r, R01i
    w1 = lam - R00
    # candidate A: (R01, lam-R00); candidate B: (lam-R11, conj(R01)).
    nA = b2 + w1 * w1
    nB = (lam - R11) * (lam - R11) + b2
    useA = nA >= nB
    e0r = jnp.where(useA, v1r, lam - R11)
    e0i = jnp.where(useA, v1i, 0.0 * v1i)
    e1r = jnp.where(useA, w1, R01r)
    e1i = jnp.where(useA, 0.0 * w1, -R01i)
    nv = jnp.sqrt(jnp.maximum(e0r * e0r + e0i * e0i + e1r * e1r + e1i * e1i, _EPS))
    e0r, e0i, e1r, e1i = e0r / nv, e0i / nv, e1r / nv, e1i / nv
    # Phase-rotate so component 0 is real-positive (inference.py:66-69).
    p0 = jnp.sqrt(jnp.maximum(e0r * e0r + e0i * e0i, _EPS))
    cr, ci = e0r / p0, -e0i / p0  # conj(phase)
    v0r = e0r * cr - e0i * ci
    v0i = e0r * ci + e0i * cr
    v1r_ = e1r * cr - e1i * ci
    v1i_ = e1r * ci + e1i * cr

    t0r, t0i = d0r[:], d0i[:]
    t1r, t1i = d1r[:], d1i[:]

    # Constraint matrix C = [[t0, v0], [t1, v1]]; solve C^H w = [1, 0]:
    #   conj(t0) w0 + conj(t1) w1 = 1
    #   conj(v0) w0 + conj(v1) w1 = 0
    # Cramer on the conjugated system.
    # det = conj(t0) conj(v1) - conj(t1) conj(v0)
    detr = (t0r * v1r_ - (-t0i) * (-v1i_)) - (t1r * v0r - (-t1i) * (-v0i))
    deti = ((-t0i) * v1r_ + t0r * (-v1i_)) - ((-t1i) * v0r + t1r * (-v0i))
    dd = detr * detr + deti * deti + _EPS
    # w0 = conj(v1)/det ; w1 = -conj(v0)/det
    w0r = (v1r_ * detr + (-v1i_) * deti) / dd
    w0i = ((-v1i_) * detr - v1r_ * deti) / dd
    w1r = -((v0r * detr + (-v0i) * deti) / dd)
    w1i = -(((-v0i) * detr - v0r * deti) / dd)

    # Condition gate: cond_2(C)^2 = (s_max/s_min)^2 from eigvals of C^H C.
    # C^H C entries (Hermitian): g00=|t|^2, g11=|v|^2=1, g01 = t^H v.
    g00 = t0r * t0r + t0i * t0i + t1r * t1r + t1i * t1i
    g11 = v0r * v0r + v0i * v0i + v1r_ * v1r_ + v1i_ * v1i_
    g01r = t0r * v0r + t0i * v0i + t1r * v1r_ + t1i * v1i_
    g01i = t0r * v0i - t0i * v0r + t1r * v1i_ - t1i * v1r_
    gh = 0.5 * (g00 - g11)
    grad = jnp.sqrt(gh * gh + g01r * g01r + g01i * g01i)
    s2max = 0.5 * (g00 + g11) + grad
    s2min = jnp.maximum(0.5 * (g00 + g11) - grad, _EPS)
    bad = s2max / s2min > cond_thr * cond_thr  # cond > threshold

    # Fallback: delay-and-sum toward target, w = d / 2 (inference.py:84).
    w0r = jnp.where(bad, 0.5 * t0r, w0r)
    w0i = jnp.where(bad, 0.5 * t0i, w0i)
    w1r = jnp.where(bad, 0.5 * t1r, w1r)
    w1i = jnp.where(bad, 0.5 * t1i, w1i)

    # S = conj(w0) Y0 + conj(w1) Y1.
    sr[:] = w0r * a0r + w0i * a0i + w1r * a1r + w1i * a1i
    si[:] = w0r * a0i - w0i * a0r + w1r * a1i - w1i * a1r


@functools.partial(jax.jit, static_argnames=("cond_threshold", "block_f", "interpret"))
def hard_null_pallas(
    Y: jnp.ndarray,
    target_mask: jnp.ndarray,
    d_tgt: jnp.ndarray,
    cond_threshold: float = 10.0,
    block_f: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused hard-null pass on one (2, F, T) STFT block (no bypass)."""
    _, F, T = Y.shape
    Fp = -(-F // block_f) * block_f
    Tp = -(-T // 128) * 128

    def padft(x):
        return jnp.pad(x, ((0, Fp - F), (0, Tp - T)))

    def padf(x):
        return jnp.pad(x.astype(jnp.float32), (0, Fp - F))[:, None]

    # Padded time columns must count as TARGET (mask 1) so they add nothing
    # to the interference covariance (kernel uses 1 - mask).
    m = jnp.pad(target_mask.astype(jnp.float32),
                ((0, Fp - F), (0, Tp - T)), constant_values=1.0)

    ft_spec = pl.BlockSpec((block_f, Tp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f1_spec = pl.BlockSpec((block_f, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    sr, si = pl.pallas_call(
        functools.partial(_kernel, float(cond_threshold)),
        grid=(Fp // block_f,),
        in_specs=[ft_spec] * 5 + [f1_spec] * 4,
        out_specs=[ft_spec, ft_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Fp, Tp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(
        padft(Y[0].real.astype(jnp.float32)),
        padft(Y[0].imag.astype(jnp.float32)),
        padft(Y[1].real.astype(jnp.float32)),
        padft(Y[1].imag.astype(jnp.float32)),
        m,
        padf(d_tgt[:, 0].real), padf(d_tgt[:, 0].imag),
        padf(d_tgt[:, 1].real), padf(d_tgt[:, 1].imag),
    )
    return jax.lax.complex(sr[:F, :T], si[:F, :T])


def hybrid_hard_null_pallas(
    Y: jnp.ndarray,
    target_mask: jnp.ndarray,
    d_tgt: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    lowfreq_bypass_hz: float = 200.0,
    cond_threshold: float = 10.0,
    block_f: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in fused replacement for
    azoom.beam.nullsteer.hybrid_hard_null_beamform (batch dims vmapped)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if Y.ndim > 3:
        lead = Y.shape[:-3]
        Yf = Y.reshape((-1,) + Y.shape[-3:])
        mf = target_mask.reshape((-1,) + target_mask.shape[-2:])
        S = jax.vmap(
            lambda y, m: hard_null_pallas(y, m, d_tgt, cond_threshold, block_f,
                                          interpret)
        )(Yf, mf)
        S = S.reshape(lead + S.shape[-2:])
    else:
        S = hard_null_pallas(Y, target_mask, d_tgt, cond_threshold, block_f,
                             interpret)
    bypass = (freqs_hz < lowfreq_bypass_hz)[:, None]
    return jnp.where(bypass, Y[..., 0, :, :], S)

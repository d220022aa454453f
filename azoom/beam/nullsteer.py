"""Hybrid hard-null beamformer — the Final-generation spatial filter.

TPU-native rebuild of ``hybrid_hard_null_bf``
(Final_pipeline/src/inference.py:28-98). Instead of a Python loop over 513
frequency bins with per-bin numpy EVD / cond / solve and try/except, the
whole thing is one batched XLA program over (..., F):

  1. interference covariance from the (1 - target) mask,
  2. principal interference eigenvector via the closed-form 2x2 Hermitian
     EVD (azoom.beam.linalg2x2),
  3. constraint matrix C = [v_tgt, v_int], solve C^H w = [1, 0] by
     Cramer's rule,
  4. data-dependent *selects* replace control flow: cond(C) > 10 ->
     delay-and-sum fallback; f < 200 Hz -> reference-mic bypass
     (inference.py:49-53, 80-92).
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.covariance import masked_covariance
from azoom.beam.linalg2x2 import cond_2x2, eigh_2x2_hermitian, solve_2x2_general

__all__ = ["hard_null_weights", "hybrid_hard_null_beamform"]


def hard_null_weights(
    R_int: jnp.ndarray,
    d_tgt: jnp.ndarray,
    cond_threshold: float = 10.0,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Null-steering weights with conditioning fallback.

    Args:
      R_int: (..., F, 2, 2) interference covariance.
      d_tgt: (..., F, 2) phase-normalized target steering vectors.

    Returns:
      (..., F, 2) weights: hard-null where well-conditioned, else
      delay-and-sum toward the target.
    """
    M = d_tgt.shape[-1]
    # Principal interference eigenvector, phase-rotated so component 0 is
    # real-positive (inference.py:66-69 divides by v[0]/|v[0]|).
    _, eigvecs = eigh_2x2_hermitian(R_int)
    v_int = eigvecs[..., :, -1]  # (..., F, 2)
    phase = v_int[..., :1] / (jnp.abs(v_int[..., :1]) + eps)
    v_int = v_int * jnp.conj(phase)

    # Constraint matrix columns [v_tgt, v_int] -> (..., F, 2, 2); d_tgt may
    # be unbatched (F, 2) while v_int carries batch dims.
    d_tgt = jnp.broadcast_to(d_tgt, v_int.shape)
    C = jnp.stack([d_tgt, v_int], axis=-1)

    # Hard-null solve: C^H w = [1, 0].
    Ch = jnp.swapaxes(jnp.conj(C), -1, -2)
    rhs = jnp.broadcast_to(
        jnp.asarray([1.0 + 0j, 0.0 + 0j], dtype=C.dtype), d_tgt.shape
    )
    w_null = solve_2x2_general(Ch, rhs, eps=eps)

    # Conditioning gate (inference.py:80-85): ill-conditioned (sources too
    # close) -> delay-and-sum fallback.
    cond = cond_2x2(C)
    w_das = d_tgt / M
    bad = ~jnp.isfinite(cond) | (cond > cond_threshold)
    w = jnp.where(bad[..., None], w_das, w_null)
    return jnp.where(jnp.isfinite(w), w, w_das)


def hybrid_hard_null_beamform(
    Y: jnp.ndarray,
    target_mask: jnp.ndarray,
    d_tgt: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    lowfreq_bypass_hz: float = 200.0,
    cond_threshold: float = 10.0,
) -> jnp.ndarray:
    """Full hybrid pass on an STFT block.

    Args:
      Y: complex STFT (..., M, F, T).
      target_mask: (..., F, T) target probabilities in [0, 1].
      d_tgt: (F, 2) or broadcastable (..., F, 2) *phase-normalized* steering.
      freqs_hz: (F,).

    Returns:
      (..., F, T) beamformed STFT. Below ``lowfreq_bypass_hz`` the raw
      reference mic passes through (inference.py:49-53); the caller applies
      any spectral post-filter.
    """
    R_int = masked_covariance(Y, 1.0 - target_mask)
    w = hard_null_weights(R_int, d_tgt, cond_threshold)
    S = jnp.einsum("...fm,...mft->...ft", jnp.conj(w), Y)
    bypass = (freqs_hz < lowfreq_bypass_hz)[:, None]
    return jnp.where(bypass, Y[..., 0, :, :], S)

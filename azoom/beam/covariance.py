"""Masked spatial covariance estimation.

The scientific core of the framework: a time-frequency noise mask selects
interference-dominated bins from which a clean per-frequency noise spatial
covariance R_noise[f] is accumulated; MVDR then nulls the interference
subspace. Replaces the per-bin Python loops of
rt_av_zoom/core/masked_mvdr.py:92-102 / oracle_debug.py:57-64 and the
einsum formulation of tf_lite_version/inference.py:107-125 with one batched
XLA contraction over the whole (freq, time) grid:

    R[f] = sum_t m[f,t] * Y[:,f,t] Y[:,f,t]^H / (sum_t m[f,t] + eps)

Leading batch dimensions (e.g. a batch of scenes or chunks) broadcast
through, so a sharded sweep evaluates thousands of mixtures in one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_covariance", "recursive_covariance_update"]


def masked_covariance(
    Y: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Mask-weighted spatial covariance per frequency bin.

    Args:
      Y: complex STFT (..., M, F, T).
      mask: real weights in [0, 1], shape (..., F, T); 1 selects the frames
        that contribute to the estimate.
      eps: normalization guard (reference uses 1e-6, masked_mvdr.py:100).

    Returns:
      complex (..., F, M, M) Hermitian covariance matrices.

    Note the reference weights the *signal* by sqrt(mask) so the outer
    product is weighted by mask — mathematically identical to weighting the
    outer products directly, which is what we do (one fewer sqrt, exact for
    binary masks and equal in exact arithmetic for soft masks).
    """
    m = mask.astype(Y.real.dtype)
    # (..., M, F, T) x (..., N, F, T) * mask(..., F, T) -> (..., F, M, N)
    # HIGHEST precision: on TPU the default bf16 contraction loses ~7 of
    # the 24 mantissa bits, which downstream eigen-solvers amplify (the
    # GEV beamformer drops ~14 dB SIR). The contraction is tiny (M=N=2),
    # so full precision costs nothing next to the mask net.
    R = jnp.einsum(
        "...mft,...ft,...nft->...fmn", Y, m, jnp.conj(Y),
        precision=jax.lax.Precision.HIGHEST,
    )
    norm = jnp.sum(m, axis=-1) + eps  # (..., F)
    return R / norm[..., None, None]


def recursive_covariance_update(
    R_prev: jnp.ndarray,
    y_frame: jnp.ndarray,
    mask_frame: jnp.ndarray,
    weight_prev: jnp.ndarray,
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-frame online update for the streaming/low-latency path.

    Maintains the running mask-weighted sums so that after any number of
    frames ``R / w`` equals :func:`masked_covariance` over the frames seen
    so far. Used by azoom.stream.online via lax.scan.

    Args:
      R_prev: (..., F, M, M) running unnormalized covariance sum.
      y_frame: (..., M, F) one STFT frame.
      mask_frame: (..., F) noise-mask weights for this frame.
      weight_prev: (..., F) running mask-weight sum.

    Returns:
      (R_new, weight_new); normalized covariance is
      ``R_new / (weight_new + eps)[..., None, None]``.
    """
    outer = jnp.einsum("...mf,...nf->...fmn", y_frame, jnp.conj(y_frame))
    R_new = R_prev + outer * mask_frame[..., None, None]
    return R_new, weight_prev + mask_frame

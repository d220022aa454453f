"""Frame-by-frame online enhancement (low-latency mode).

The reference's lowest-latency option is still a 2 s chunk
(Final_pipeline/src/config.py:18); SURVEY.md §5 calls out the natural TPU
generalization: a *recursive* per-frame covariance update, giving
per-STFT-frame operation (one 32 ms hop per step; OLA finalization bounds
algorithmic latency at hop-to-window, 32-64 ms) instead of per-chunk (1 s).

Implemented as a ``lax.scan`` over STFT frames: each step updates
exponentially-forgotten mask-weighted covariance statistics and applies the
current MVDR weights to the current frame. One jitted program; state is a
(F, M, M) covariance + (F,) weight accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.beam.linalgmm import solve_hermitian
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft

__all__ = ["online_masked_mvdr", "online_enhance"]


def online_masked_mvdr(
    Y: jnp.ndarray,
    noise_mask: jnp.ndarray,
    d: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    sigma: float = 1e-7,
    hp_cutoff_hz: float = 100.0,
    forget: float = 0.98,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Causal MVDR over an STFT block: frame t uses only frames <= t.

    Args:
      Y: complex STFT (M, F, T).
      noise_mask: (F, T) noise weights.
      d: (F, M) steering vectors.
      forget: exponential forgetting factor for the running covariance
        (1.0 = growing window, matching the batch estimate as T->inf).

    Returns:
      (F, T) beamformed STFT, causally enhanced.
    """
    M, F, T = Y.shape
    # Prime with a small identity so the first frames are well-posed
    # (equivalent to diagonal loading before any data arrives).
    R0 = jnp.broadcast_to(jnp.eye(M, dtype=Y.dtype) * eps, (F, M, M))
    w0 = jnp.full((F,), eps, Y.real.dtype)

    keep = (freqs_hz >= hp_cutoff_hz)[:, None]
    eye = jnp.eye(M, dtype=Y.dtype)

    def step(carry, inp):
        R_sum, w_sum = carry
        y_t, m_t = inp  # (M, F), (F,)
        outer = jnp.einsum("mf,nf->fmn", y_t, jnp.conj(y_t))
        R_sum = forget * R_sum + outer * m_t[:, None, None]
        w_sum = forget * w_sum + m_t
        R = R_sum / (w_sum + eps)[:, None, None]
        R_loaded = R + sigma * eye
        # Dispatches to the closed-form 2x2 at M=2 (the product hot
        # path), the unrolled Cholesky at M>2 — the online path is
        # M-general like the batch MVDR (azoom.beam.linalgmm).
        Rinv_d = solve_hermitian(R_loaded, d)
        denom = jnp.sum(jnp.conj(d) * Rinv_d, axis=-1, keepdims=True)
        w = Rinv_d / (denom + 1e-10)
        s_t = jnp.sum(jnp.conj(w) * y_t.T, axis=-1)  # (F,)
        return (R_sum, w_sum), s_t

    _, S = jax.lax.scan(
        step, (R0, w0), (jnp.moveaxis(Y, -1, 0), noise_mask.T)
    )  # S: (T, F)
    return jnp.where(keep, S.T, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def online_enhance(
    mixture: jnp.ndarray,
    noise_mask_fn_output: jnp.ndarray,
    cfg: PipelineConfig,
    forget: float = 0.98,
    length: int | None = None,
) -> jnp.ndarray:
    """Causal streaming enhancement of a whole recording.

    ``noise_mask_fn_output`` is a precomputed (F, T) noise mask (oracle or
    model-predicted); causality of the *mask* is the caller's concern — this
    function guarantees the covariance/beamforming is causal.
    """
    n = mixture.shape[-1]
    length = n if length is None else length
    Y = stft(mixture, cfg.n_fft, cfg.hop)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, cfg.angle_target_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
    S = online_masked_mvdr(
        Y, noise_mask_fn_output, d, freqs, cfg.sigma, cfg.hp_cutoff_hz, forget
    )
    S = S * jnp.maximum(1.0 - noise_mask_fn_output, 0.05)
    return istft(S, cfg.n_fft, cfg.hop, length=length)

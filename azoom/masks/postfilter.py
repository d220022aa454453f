"""Spectral post-filters beyond plain mask multiplication.

Implements the reference roadmap's "harmonic regeneration" post-filter
(TODO:5 "add a post filter to fix the damage of the masking. harmonic
regeneration non linear in process") — classical HRNR (Plapous et al.
2006): aggressive masking leaves spectral holes at harmonics; a
non-linearity on the enhanced waveform (half-wave rectification)
regenerates all harmonics of the surviving fundamentals, and a refined
Wiener gain blends regenerated harmonic power back in. Pure JAX; runs
inside the same graph as the beamformer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.dsp.stft import istft, stft

__all__ = ["harmonic_regeneration", "spectral_floor"]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "rho"))
def harmonic_regeneration(
    S_enhanced: jnp.ndarray,
    S_mixture_ref: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 512,
    rho: float = 0.5,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """HRNR pass on an enhanced STFT block.

    Args:
      S_enhanced: (..., F, T) beamformed+masked STFT (has spectral holes).
      S_mixture_ref: (..., F, T) reference-mic mixture STFT (noise proxy).
      rho: blend weight of regenerated harmonic power (0 = no-op).

    Returns: (..., F, T) refined STFT.
    """
    x = istft(S_enhanced, n_fft, hop)
    # Non-linearity: half-wave rectification regenerates harmonics of every
    # surviving fundamental.
    S_harm = stft(jnp.maximum(x, 0.0), n_fft, hop)
    T = min(S_enhanced.shape[-1], S_harm.shape[-1])
    S_e = S_enhanced[..., :T]
    S_h = S_harm[..., :T]
    S_m = S_mixture_ref[..., :T]

    P_e = jnp.abs(S_e) ** 2
    P_h = jnp.abs(S_h) ** 2
    # Scale regenerated power to the enhanced signal's level.
    scale = jnp.sum(P_e, axis=-2, keepdims=True) / (
        jnp.sum(P_h, axis=-2, keepdims=True) + eps
    )
    P_sig = (1.0 - rho) * P_e + rho * scale * P_h
    P_noise = jnp.maximum(jnp.abs(S_m) ** 2 - P_e, 0.0)
    gain = P_sig / (P_sig + P_noise + eps)
    out = gain * S_m
    if T < S_enhanced.shape[-1]:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, S_enhanced.shape[-1] - T)])
    return out


def spectral_floor(S: jnp.ndarray, mask: jnp.ndarray, floor: float = 0.05) -> jnp.ndarray:
    """Floored mask application — max(mask, floor) * S
    (full_audio_generating_pipeline/inference.py:116)."""
    return S * jnp.maximum(mask, floor)

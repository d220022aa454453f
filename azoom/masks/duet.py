"""DUET-style spatial clustering masks.

The reference roadmap's "DUET for post processing" (TODO:7): assign each TF
bin to a source by clustering its spatial signature. With 2 mics the
signature per bin is the (delay, attenuation) pair; here bins vote in the
per-bin DOA domain (azoom.localize.srp.ipd_angle_histogram's physics) and a
soft assignment around each source bearing yields per-source masks — usable
directly as separation masks or as post-processing to clean a learned mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["duet_masks", "bin_doa"]


@functools.partial(jax.jit, static_argnames=("fs",))
def bin_doa(
    Y: jnp.ndarray,
    mic_dist: float,
    fs: int,
    c: float = 343.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-TF-bin DOA estimate.

    Returns (theta_deg (..., F, T), valid (..., F, T)) where valid flags
    bins below the spatial-aliasing limit with a physical |cos| <= 1.
    """
    F = Y.shape[-2]
    n_fft = 2 * (F - 1)
    freqs = jnp.arange(F, dtype=jnp.float32) * (fs / n_fft)
    # Adjacent pairs of a uniform array share the spacing: averaging
    # their cross-spectra is an (M-1)-fold coherent phase-noise average
    # (identical at M = 2 — the mean of one pair).
    cross = jnp.mean(Y[..., :-1, :, :] * jnp.conj(Y[..., 1:, :, :]), axis=-3)
    ipd = jnp.angle(cross + 1e-20)
    cos_t = -ipd * c / (2.0 * jnp.pi * jnp.maximum(freqs, 1.0)[:, None] * mic_dist)
    alias_ok = (freqs[:, None] <= c / (2.0 * mic_dist)) & (freqs[:, None] > 0)
    valid = (jnp.abs(cos_t) <= 1.0) & alias_ok
    theta = jnp.rad2deg(jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)))
    return theta, valid


@functools.partial(jax.jit, static_argnames=("fs",))
def duet_masks(
    Y: jnp.ndarray,
    source_angles_deg: jnp.ndarray,
    mic_dist: float,
    fs: int,
    c: float = 343.0,
    width_deg: float = 15.0,
    invalid_value: float = 0.5,
) -> jnp.ndarray:
    """Soft per-source masks by nearest-bearing assignment.

    Args:
      Y: (..., 2, F, T) stereo STFT.
      source_angles_deg: (K,) known/estimated source bearings.
      width_deg: softness of the angular assignment kernel.
      invalid_value: mask value for bins with no usable spatial cue
        (aliased / out-of-range) — 0.5 leaves them undecided.

    Returns: (..., K, F, T) masks in [0, 1] (softmax over sources).
    """
    theta, valid = bin_doa(Y, mic_dist, fs, c)
    diff = theta[..., None, :, :] - source_angles_deg[:, None, None]  # (...,K,F,T)
    logits = -0.5 * (diff / width_deg) ** 2
    masks = jax.nn.softmax(logits, axis=-3)
    return jnp.where(valid[..., None, :, :], masks, invalid_value)

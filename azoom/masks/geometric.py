"""Blind geometric (inter-channel phase difference) masks.

TPU-native equivalent of the hard IPD mask in
rt_av_zoom/core/masked_mvdr.py:37-46: TF bins whose inter-channel phase
difference deviates from the target direction's expected IPD are flagged as
noise-dominated.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ipd", "hard_geometric_noise_mask"]


def ipd(Y: jnp.ndarray) -> jnp.ndarray:
    """Inter-channel phase difference angle(Y0) - angle(Y1) of a stereo STFT
    Y (..., 2, F, T) -> (..., F, T)."""
    return jnp.angle(Y[..., 0, :, :]) - jnp.angle(Y[..., 1, :, :])


def hard_geometric_noise_mask(
    Y: jnp.ndarray,
    threshold: float = 0.0,
    floor: float = 0.01,
) -> jnp.ndarray:
    """Hard IPD noise mask: 1.0 where |IPD| > threshold else ``floor``.

    With the reference's broadside target (90 deg) the expected target IPD is
    zero, so any phase deviation marks interference (masked_mvdr.py:41-45).
    """
    phase_diff = ipd(Y)
    return jnp.where(jnp.abs(phase_diff) > threshold, 1.0, floor).astype(jnp.float32)


def ipd_deviation_noise_mask(
    Y: jnp.ndarray,
    expected_ipd: jnp.ndarray,
    width: float = 0.5,
) -> jnp.ndarray:
    """Soft geometric mask from deviation against an expected per-bin IPD
    (e.g. a steered non-broadside target): sigmoid-shaped in the wrapped
    phase distance. Generalizes the hard mask to arbitrary steering angles."""
    diff = ipd(Y) - expected_ipd[..., :, None]
    # Wrap to (-pi, pi] without complex math (eager complex exp is
    # unimplemented on some TPU runtimes).
    dev = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.clip(jnp.abs(dev) / (width * jnp.pi), 0.0, 1.0).astype(jnp.float32)

"""Anechoic far-field scene synthesis (fractional-delay mixing).

TPU-native rebuild of the gen 2-4 world builders
(full_audio_generating_pipeline/world_building.py:40-93,
model_training.py:66-77): each source at azimuth theta is delayed to each
mic by its far-field TDOA via an FFT phase ramp and summed. Vectorized over
sources and mics, batched over scenes — a whole batch of training mixtures
is one XLA program (the on-the-fly Dataset.__getitem__ becomes a jitted
function).
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.dsp.delays import far_field_delays, fractional_delay

__all__ = ["mix_far_field", "make_scene"]


def mix_far_field(
    sources: jnp.ndarray,
    angles_deg: jnp.ndarray,
    mic_dist: float,
    fs: float,
    c: float = 343.0,
    n_mics: int = 2,
    positions: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mix S far-field sources into an M-mic array observation.

    Args:
      sources: (..., S, n) mono source signals.
      angles_deg: (S,) or (..., S) azimuths.
      mic_dist: inter-mic spacing (m).
      fs: sample rate (Hz).
      positions: optional explicit mic coordinates ((M,), (M, 2) or
        (M, 3) meters) — arbitrary-geometry synthesis (round 4).

    Returns:
      (..., M, n) mixture = sum_s delay(source_s, tau_m(theta_s)).
    """
    return jnp.sum(
        _delayed_images(sources, angles_deg, mic_dist, c, n_mics, fs,
                        positions),
        axis=-3,
    )


def _delayed_images(sources, angles_deg, mic_dist, c, n_mics, fs,
                    positions=None):
    """Per-source per-mic delayed copies (..., S, M, n)."""
    tau = far_field_delays(
        jnp.asarray(angles_deg), mic_dist, c, n_mics, positions
    )  # (..., S, M)
    src = jnp.expand_dims(sources, -2)  # (..., S, 1, n)
    return fractional_delay(src, tau, fs)


def make_scene(
    target: jnp.ndarray,
    interferers: jnp.ndarray,
    target_angle_deg: float,
    interferer_angles_deg: jnp.ndarray,
    mic_dist: float,
    fs: float,
    c: float = 343.0,
    n_mics: int = 2,
    normalize: bool = True,
    positions: jnp.ndarray | None = None,
):
    """Build a far-field scene with ground-truth stems.

    Args:
      target: (..., n) mono target signal.
      interferers: (..., K, n) mono interferer signals (K may be 0).
      target_angle_deg / interferer_angles_deg: azimuths.

    Returns dict with:
      mixture: (..., M, n)
      target_ref: (..., n) target as heard at mic 0 (the "answer key",
        world_building.py:82-85)
      interference_ref: (..., n) summed interferers at mic 0.
      All three share the mixture's peak normalization so oracle masks and
      metrics see consistent scales (world_building.py:88-92).
    """
    sources = jnp.concatenate([target[..., None, :], interferers], axis=-2)
    angles = jnp.concatenate(
        [
            jnp.asarray([target_angle_deg], dtype=jnp.float32),
            jnp.asarray(interferer_angles_deg, dtype=jnp.float32).reshape(-1),
        ]
    )
    imgs = _delayed_images(
        sources, angles, mic_dist, c, n_mics, fs, positions
    )  # (..., S, M, n)
    mixture = jnp.sum(imgs, axis=-3)  # (..., M, n)
    target_ref = imgs[..., 0, 0, :]
    interference_ref = jnp.sum(imgs[..., 1:, 0, :], axis=-2)
    if normalize:
        peak = jnp.max(jnp.abs(mixture), axis=(-2, -1), keepdims=True) + 1e-9
        mixture = mixture / peak
        target_ref = target_ref / peak[..., 0, :]
        interference_ref = interference_ref / peak[..., 0, :]
    return {
        "mixture": mixture,
        "target_ref": target_ref,
        "interference_ref": interference_ref,
    }

"""Input features for learned mask estimation.

Rebuilds the reference's two feature generations, channels-LAST (TPU/XLA's
native conv layout), batched over leading dims:

  * 2-channel: log-magnitude (mic 0) + raw IPD
    (model_training.py:85-87, resnet_model_mvdr/inference.py:161-166).
  * 4-channel "physics-aware": log-magnitude + sin(IPD) + cos(IPD) +
    normalized frequency coordinate map
    (Final_pipeline/src/inference.py:117-127). sin/cos removes the phase
    wrap discontinuity; the freq map gives the conv net absolute frequency
    position despite being frequency-translation-invariant.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["logmag_ipd_features", "physics_aware_features"]

_EPS = 1e-7


def logmag_ipd_features(Y: jnp.ndarray) -> jnp.ndarray:
    """Stereo STFT (..., 2, F, T) -> features (..., F, T, 2):
    [log|Y0|, IPD]."""
    logmag = jnp.log(jnp.abs(Y[..., 0, :, :]) + _EPS)
    ipd = jnp.angle(Y[..., 0, :, :]) - jnp.angle(Y[..., 1, :, :])
    return jnp.stack([logmag, ipd], axis=-1)


def physics_aware_features(Y: jnp.ndarray) -> jnp.ndarray:
    """Stereo STFT (..., 2, F, T) -> features (..., F, T, 4):
    [log|Y0|, sin(IPD), cos(IPD), freq_map]."""
    logmag = jnp.log(jnp.abs(Y[..., 0, :, :]) + _EPS)
    # sin/cos of IPD without computing angles: Y0 * conj(Y1) has phase = IPD.
    cross = Y[..., 0, :, :] * jnp.conj(Y[..., 1, :, :])
    mag = jnp.abs(cross) + 1e-12
    sin_ipd = cross.imag / mag
    cos_ipd = cross.real / mag
    F = Y.shape[-2]
    fmap = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, F, dtype=jnp.float32)[:, None], logmag.shape[-2:]
    )
    fmap = jnp.broadcast_to(fmap, logmag.shape)
    return jnp.stack([logmag, sin_ipd, cos_ipd, fmap], axis=-1)

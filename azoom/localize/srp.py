"""SRP (steered response power) localization — the beam-steering front end.

TPU-native rebuild of scripts/debug_srp.py:25-89: scan candidate azimuths,
steer a delay-and-sum beam at each, and measure output energy in the
200-4000 Hz speech band; the peak is the source bearing. In the product
concept this is what converts the *visual* zoom region into the steering
angle for the beamformer (BASELINE.json: "SRP-PHAT localization steering
the beam from the visual zoom region").

The reference loops 181 angles in Python; here the angle axis is just
another batched dimension of one einsum.

``phat=True`` adds the classical PHAT magnitude whitening (not in the
reference's debug script, standard for robustness in reverb).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.dsp.delays import steering_matrix

__all__ = ["srp_map", "srp_localize"]


@functools.partial(jax.jit, static_argnames=("n_angles", "phat"))
def srp_map(
    Y: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    mic_dist: float,
    band_hz: tuple[float, float] = (200.0, 4000.0),
    n_angles: int = 181,
    c: float = 343.0,
    phat: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Steered response power over an azimuth grid.

    Args:
      Y: complex STFT (..., M, F, T).
      freqs_hz: (F,) bin frequencies.
      band_hz: analysis band (debug_srp.py:54 uses 200-4000 Hz).
      phat: magnitude-whiten Y before steering (SRP-PHAT).

    Returns:
      (angles_deg (A,), power (..., A)) with power linear (normalize to dB
      for plotting as debug_srp.py:61-63 does).
    """
    angles = jnp.linspace(0.0, 180.0, n_angles)
    M = Y.shape[-3]
    if phat:
        Y = Y / (jnp.abs(Y) + 1e-10)
    D = steering_matrix(freqs_hz, angles, mic_dist, c, M)  # (A, F, M)
    band = (freqs_hz >= band_hz[0]) & (freqs_hz <= band_hz[1])
    # Delay-and-sum at each angle: s_a(f,t) = d_a(f)^H Y(:,f,t) / M.
    S = jnp.einsum("afm,...mft->...aft", jnp.conj(D), Y) / M
    power = jnp.sum((jnp.abs(S) ** 2) * band[:, None], axis=(-2, -1))
    return angles, power


def srp_localize(
    Y: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    mic_dist: float,
    **kwargs,
) -> jnp.ndarray:
    """Peak of the SRP map: estimated source azimuth in degrees (...,)."""
    angles, power = srp_map(Y, freqs_hz, mic_dist, **kwargs)
    return angles[jnp.argmax(power, axis=-1)]

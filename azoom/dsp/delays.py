"""Far-field array geometry: TDOA delays, steering vectors, fractional delay.

The reference re-implements the 2-mic steering vector six times with minor
variations (rt_av_zoom/core/masked_mvdr.py:22-35,
Final_pipeline/src/inference.py:16-26, tf_lite_version/inference.py:53-66,
scripts/debug_srp.py:17-23, ...). This is the single canonical version,
vectorized over frequency bins and angles, generalized to M-mic uniform
linear arrays (M=2 reproduces the reference phases exactly).

Geometry convention (matching the reference): mic m sits at
``x_m = ((M-1)/2 - m) * d`` on the array axis, so for M=2 mic 0 is at +d/2
and mic 1 at -d/2; a far-field plane wave from azimuth theta arrives at mic m
with delay ``tau_m = x_m * cos(theta) / c`` relative to the array center.
theta = 90 deg is broadside (zero delay on all mics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "mic_positions",
    "far_field_delays",
    "steering_vector",
    "steering_matrix",
    "fractional_delay",
]


def mic_positions(n_mics: int, mic_dist: float) -> jnp.ndarray:
    """1-D mic coordinates (meters) along the array axis, array-centered."""
    m = jnp.arange(n_mics, dtype=jnp.float32)
    return ((n_mics - 1) / 2.0 - m) * mic_dist


def far_field_delays(
    angle_deg: jnp.ndarray | float,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
) -> jnp.ndarray:
    """Per-mic arrival delays (seconds) for far-field azimuth angle(s).

    Returns shape (..., n_mics) broadcasting over the angle input.
    Matches rt_av_zoom/core/full_audio_generating_pipeline/world_building.py:40-44
    for n_mics=2.
    """
    theta = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    x = mic_positions(n_mics, mic_dist)
    return jnp.cos(theta)[..., None] * x / c


@functools.partial(jax.jit, static_argnames=("n_mics", "normalize_phase"))
def steering_vector(
    freqs_hz: jnp.ndarray,
    angle_deg: float | jnp.ndarray,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
    normalize_phase: bool = False,
) -> jnp.ndarray:
    """Far-field steering vectors d(f, theta) for all frequency bins at once.

    Args:
      freqs_hz: (F,) bin center frequencies.
      angle_deg: scalar azimuth (or (..., ) batch of azimuths).
      normalize_phase: divide by the mic-0 phase so the reference mic is
        real-positive (Final_pipeline/src/inference.py:25).

    Returns:
      complex64 array of shape (..., F, n_mics):
      ``d[..., f, m] = exp(-1j * 2 pi f * tau_m(theta))``.
    """
    theta = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    x = mic_positions(n_mics, mic_dist)  # (M,)
    tau = jnp.cos(theta)[..., None] * x / c  # (..., M)
    phase = (-2.0 * jnp.pi * freqs_hz[:, None] * tau[..., None, :]).astype(
        jnp.float32
    )  # (..., F, M)
    # lax.complex(cos, sin) rather than exp(1j*phase): the axon TPU backend
    # does not implement eager complex exp, and this form is one VPU pass.
    d = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    if normalize_phase:
        ref = d[..., :, :1]
        d = d * jnp.conj(ref) / (jnp.abs(ref) + 1e-10)
    return d


def steering_matrix(
    freqs_hz: jnp.ndarray,
    angles_deg: jnp.ndarray,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
) -> jnp.ndarray:
    """Steering vectors for a grid of angles: (A, F, n_mics). Used by the
    SRP angle scan (scripts/debug_srp.py:46-59) and beam-pattern analysis."""
    return steering_vector(freqs_hz, jnp.asarray(angles_deg), mic_dist, c, n_mics)


@jax.jit
def fractional_delay(x: jnp.ndarray, delay_sec: jnp.ndarray | float, fs: float) -> jnp.ndarray:
    """Delay a real signal by a (possibly fractional-sample) time via an
    rfft phase ramp — the anechoic mixing primitive
    (world_building.py:46-52). Supports batched x (..., n) with broadcastable
    scalar or (...,) delays."""
    n = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    freqs = jnp.fft.rfftfreq(n, 1.0 / fs).astype(jnp.float32)
    delay = jnp.asarray(delay_sec, dtype=jnp.float32)[..., None]
    phase = (-2.0 * jnp.pi * freqs * delay).astype(jnp.float32)
    shift = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return jnp.fft.irfft(X * shift, n=n, axis=-1)

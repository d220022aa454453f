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

ARBITRARY GEOMETRY (round 4): every function accepts ``positions`` —
explicit per-mic coordinates in meters, shape (M,), (M, 2) or (M, 3) —
overriding the uniform-linear layout. The plane-wave direction for
azimuth theta is u = (cos theta, sin theta) in the x-y plane, so
``tau_m = (p_m . u) / c``; a linear array on the x axis reproduces the
reference model exactly, and a real device array (camera bar, tablet
corners) is expressed directly. A (M, 3) z coordinate is accepted and
ignored by azimuth-only steering (elevation is out of the product's
steering plane; the scene simulators place 3-D arrays in rooms).
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


def positions_2d(
    n_mics: int, mic_dist: float, positions: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(M, 2) planar mic coordinates: explicit ``positions`` ((M,),
    (M, 2) or (M, 3) — z dropped for azimuth steering) or the canonical
    uniform-linear layout on the x axis."""
    if positions is None:
        x = mic_positions(n_mics, mic_dist)
        return jnp.stack([x, jnp.zeros_like(x)], axis=-1)
    p = jnp.asarray(positions, dtype=jnp.float32)
    if p.ndim == 1:
        p = jnp.stack([p, jnp.zeros_like(p)], axis=-1)
    return p[..., :2]


def far_field_delays(
    angle_deg: jnp.ndarray | float,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
    positions: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-mic arrival delays (seconds) for far-field azimuth angle(s).

    Returns shape (..., n_mics) broadcasting over the angle input.
    Matches rt_av_zoom/core/full_audio_generating_pipeline/world_building.py:40-44
    for n_mics=2; ``positions`` expresses arbitrary planar arrays
    (tau_m = p_m . (cos theta, sin theta) / c).
    """
    theta = jnp.deg2rad(jnp.asarray(angle_deg, dtype=jnp.float32))
    p = positions_2d(n_mics, mic_dist, positions)  # (M, 2)
    u = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)  # (..., 2)
    return jnp.sum(u[..., None, :] * p, axis=-1) / c  # (..., M)


@functools.partial(jax.jit, static_argnames=("n_mics", "normalize_phase"))
def steering_vector(
    freqs_hz: jnp.ndarray,
    angle_deg: float | jnp.ndarray,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
    normalize_phase: bool = False,
    positions: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Far-field steering vectors d(f, theta) for all frequency bins at once.

    Args:
      freqs_hz: (F,) bin center frequencies.
      angle_deg: scalar azimuth (or (..., ) batch of azimuths).
      normalize_phase: divide by the mic-0 phase so the reference mic is
        real-positive (Final_pipeline/src/inference.py:25).
      positions: optional explicit mic coordinates (overrides the linear
        ``mic_dist``/``n_mics`` layout; see module docstring).

    Returns:
      complex64 array of shape (..., F, M):
      ``d[..., f, m] = exp(-1j * 2 pi f * tau_m(theta))``.
    """
    tau = far_field_delays(angle_deg, mic_dist, c, n_mics, positions)  # (..., M)
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
    positions: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Steering vectors for a grid of angles: (A, F, n_mics). Used by the
    SRP angle scan (scripts/debug_srp.py:46-59) and beam-pattern analysis."""
    return steering_vector(
        freqs_hz, jnp.asarray(angles_deg), mic_dist, c, n_mics,
        positions=positions,
    )


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

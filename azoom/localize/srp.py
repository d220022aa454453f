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
    positions: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Steered response power over an azimuth grid.

    Args:
      Y: complex STFT (..., M, F, T).
      freqs_hz: (F,) bin frequencies.
      band_hz: analysis band (debug_srp.py:54 uses 200-4000 Hz).
      phat: magnitude-whiten Y before steering (SRP-PHAT).
      positions: optional explicit mic coordinates — localization on
        arbitrary planar arrays (round 4); overrides ``mic_dist``.

    Returns:
      (angles_deg (A,), power (..., A)) with power linear (normalize to dB
      for plotting as debug_srp.py:61-63 does).
    """
    angles = jnp.linspace(0.0, 180.0, n_angles)
    M = Y.shape[-3]
    if phat:
        Y = Y / (jnp.abs(Y) + 1e-10)
    D = steering_matrix(freqs_hz, angles, mic_dist, c, M,
                        positions=positions)  # (A, F, M)
    band = (freqs_hz >= band_hz[0]) & (freqs_hz <= band_hz[1])
    # Delay-and-sum at each angle: s_a(f,t) = d_a(f)^H Y(:,f,t) / M.
    S = jnp.einsum("afm,...mft->...aft", jnp.conj(D), Y) / M
    power = jnp.sum((jnp.abs(S) ** 2) * band[:, None], axis=(-2, -1))
    return angles, power


def srp_localize(
    Y: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    mic_dist: float,
    positions: jnp.ndarray | None = None,
    **kwargs,
) -> jnp.ndarray:
    """Peak of the SRP map: estimated source azimuth in degrees (...,)."""
    angles, power = srp_map(Y, freqs_hz, mic_dist, positions=positions,
                            **kwargs)
    return angles[jnp.argmax(power, axis=-1)]


@functools.partial(jax.jit, static_argnames=("fs", "n_angles"))
def gcc_phat_map(
    Y: jnp.ndarray,
    mic_dist: float,
    fs: int,
    c: float = 343.0,
    n_angles: int = 181,
    band_hz: tuple[float, float] = (200.0, 4000.0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GCC-PHAT angular spectrum for a 2-mic pair.

    Wideband delay-and-sum lobes from multiple talkers merge on a small
    2-mic aperture (the srp_map failure mode); phase-transform weighting
    whitens each TF bin so every source contributes a near-delta at its
    TDOA. The steered cross-correlation is evaluated directly on the
    angular grid via tau = mic_dist cos(theta) / c, which gives arbitrary
    sub-sample delay resolution without an explicit upsampled irfft (the
    true TDOA range is only +/- mic_dist/c ~ 2 samples at 16 kHz/8 cm).

    Args:
      Y: complex STFT (..., 2, F, T) (one-sided bins of an n_fft frame).

    Returns: (angles_deg (A,), gcc_power (..., A)).
    """
    F = Y.shape[-2]
    n_fft = 2 * (F - 1)
    freqs = jnp.arange(F, dtype=jnp.float32) * (fs / n_fft)
    band = ((freqs >= band_hz[0]) & (freqs <= band_hz[1])).astype(jnp.float32)

    cross = Y[..., 0, :, :] * jnp.conj(Y[..., 1, :, :])  # (..., F, T)
    cross = cross / (jnp.abs(cross) + 1e-10)  # PHAT whitening
    cross = jnp.mean(cross, axis=-1) * band  # (..., F)

    angles = jnp.linspace(0.0, 180.0, n_angles)
    tau = mic_dist * jnp.cos(jnp.deg2rad(angles)) / c  # seconds, (A,)
    # Evaluate Re sum_f cross(f) e^{+j 2 pi f tau} directly on the angular
    # grid (steered cross-correlation; equivalent to upsampled irfft).
    phase = 2.0 * jnp.pi * freqs[None, :] * tau[:, None]  # (A, F)
    steer = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    gcc = jnp.einsum("...f,af->...a", cross, steer).real
    return angles, gcc


@functools.partial(jax.jit, static_argnames=("fs", "n_angles"))
def ipd_angle_histogram(
    Y: jnp.ndarray,
    mic_dist: float,
    fs: int,
    c: float = 343.0,
    n_angles: int = 181,
    band_hz: tuple[float, float] = (200.0, None),
    kernel_deg: float = 5.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sparsity-based localization: per-TF-bin DOA histogram (DUET-style).

    Broadband cross-correlation cannot separate two talkers on a small
    2-mic aperture (correlation peak width >> the +/- mic_dist/c TDOA
    range). But speech is TF-sparse — most bins are dominated by ONE
    source — so each bin below the spatial-aliasing frequency votes for an
    azimuth via its IPD:  cos(theta) = IPD * c / (2 pi f d).  Magnitude^2-
    weighted soft-binned votes produce a multimodal angular spectrum with a
    mode per source. This is the same physics that makes the masked-MVDR
    approach work (readme.md:19-23), applied to localization.

    Args:
      Y: complex STFT (..., M, F, T); M >= 2. A uniform linear array's
        adjacent pairs all share the spacing ``mic_dist``, so their
        cross-spectra are coherently averaged before the angle read-out —
        identical to the 2-mic formula at M = 2, and an (M-1)-fold
        phase-noise average on larger arrays.
      band_hz: (lo, hi); hi=None caps at the spatial-aliasing limit
        c / (2 mic_dist).

    Returns: (angles_deg (A,), histogram (..., A)).
    """
    F = Y.shape[-2]
    n_fft = 2 * (F - 1)
    freqs = jnp.arange(F, dtype=jnp.float32) * (fs / n_fft)
    hi = band_hz[1] if band_hz[1] is not None else c / (2.0 * mic_dist)
    valid = (freqs >= band_hz[0]) & (freqs <= hi)

    cross = jnp.mean(
        Y[..., :-1, :, :] * jnp.conj(Y[..., 1:, :, :]), axis=-3
    )  # (..., F, T)
    ipd = jnp.angle(cross + 1e-20)
    # Geometry (azoom.dsp.delays): tau0 - tau1 = d cos(theta) / c and
    # IPD = -2 pi f (tau0 - tau1)  =>  cos(theta) = -IPD c / (2 pi f d).
    cos_t = -ipd * c / (2.0 * jnp.pi * jnp.maximum(freqs, 1.0)[:, None] * mic_dist)
    in_range = jnp.abs(cos_t) <= 1.0
    theta = jnp.rad2deg(jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)))  # (..., F, T)

    w = (jnp.abs(Y[..., 0, :, :]) ** 2) * valid[:, None] * in_range
    angles = jnp.linspace(0.0, 180.0, n_angles)
    # Soft binning: Gaussian kernel vote onto the angle grid (einsum -> MXU).
    diff = theta[..., None] - angles  # (..., F, T, A)
    votes = jnp.exp(-0.5 * (diff / kernel_deg) ** 2) * w[..., None]
    hist = jnp.sum(votes, axis=(-3, -2))
    return angles, hist


def ipd_histogram_localize(
    Y: jnp.ndarray,
    mic_dist: float,
    fs: int,
    fov_center_deg: float | None = None,
    fov_width_deg: float = 180.0,
    **kwargs,
) -> jnp.ndarray:
    """Dominant azimuth of the IPD histogram, optionally restricted to the
    visual-zoom field of view."""
    angles, hist = ipd_angle_histogram(Y, mic_dist, fs, **kwargs)
    if fov_center_deg is not None:
        in_fov = jnp.abs(angles - fov_center_deg) <= fov_width_deg / 2.0
        hist = jnp.where(in_fov, hist, -jnp.inf)
    return angles[jnp.argmax(hist, axis=-1)]


def gcc_phat_localize(
    Y: jnp.ndarray,
    mic_dist: float,
    fs: int,
    fov_center_deg: float | None = None,
    fov_width_deg: float = 180.0,
    **kwargs,
) -> jnp.ndarray:
    """Dominant azimuth by GCC-PHAT, optionally restricted to a
    field-of-view window (the visual zoom region)."""
    angles, gcc = gcc_phat_map(Y, mic_dist, fs, **kwargs)
    if fov_center_deg is not None:
        in_fov = jnp.abs(angles - fov_center_deg) <= fov_width_deg / 2.0
        gcc = jnp.where(in_fov, gcc, -jnp.inf)
    return angles[jnp.argmax(gcc, axis=-1)]

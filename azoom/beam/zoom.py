"""The "audio zoom" control surface: beam patterns and sigma <-> beamwidth.

The reference's headline UX — zooming the acoustic beam in/out with the
visual zoom — is controlled by the MVDR diagonal loading sigma: small sigma
lets the beamformer place aggressive nulls (narrow acceptance beam, "Zoom
In"), large sigma regularizes toward delay-and-sum (wide beam, "Zoom Out").
The study artifacts (assets/plots/beam_pattern_sigma_*.png,
sigma_vs_beamwidth.png, beam_pattern_Zoom {In (Narrow),Out (Wide)}.png)
exist without their code (gitignored experiments/, SURVEY.md §1); this
module is the restored, first-class API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import mvdr_weights
from azoom.dsp.delays import steering_matrix

__all__ = [
    "beam_pattern",
    "beamwidth_3db",
    "sigma_vs_beamwidth",
    "zoom_to_sigma",
]


def beam_pattern(
    w: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    angles_deg: jnp.ndarray,
    mic_dist: float,
    c: float = 343.0,
) -> jnp.ndarray:
    """Spatial response power |w(f)^H d(f, theta)|^2.

    Args:
      w: (..., F, M) beamformer weights.
      angles_deg: (A,) scan azimuths.

    Returns:
      (..., A, F) linear power response.
    """
    D = steering_matrix(freqs_hz, angles_deg, mic_dist, c, w.shape[-1])  # (A,F,M)
    resp = jnp.einsum("...fm,afm->...af", jnp.conj(w), D)
    return jnp.abs(resp) ** 2


def beamwidth_3db(
    pattern: jnp.ndarray, angles_deg: jnp.ndarray, target_deg: float
) -> jnp.ndarray:
    """-3 dB main-lobe width (degrees) of an (..., A) broadband pattern.

    Measured as the angular measure of the region around the target where
    the response stays within 3 dB of the target response — robust to
    sidelobes on a coarse grid (no root finding; pure reductions, jittable).
    """
    a = jnp.asarray(angles_deg)
    i_tgt = jnp.argmin(jnp.abs(a - target_deg))
    ref = pattern[..., i_tgt][..., None]
    above = pattern >= ref * (10.0 ** (-3.0 / 10.0))
    # Contiguity: walk outward from the target with cummax-of-NOT trick.
    idx = jnp.arange(a.shape[0])
    right = idx >= i_tgt
    # First False at-or-right of target bounds the lobe; same to the left.
    blocked_r = jnp.cumsum(jnp.where(right & ~above, 1, 0), axis=-1) > 0
    left = idx <= i_tgt
    blocked_l = (
        jnp.cumsum(jnp.where(left & ~above, 1, 0)[..., ::-1], axis=-1) > 0
    )[..., ::-1]
    in_lobe = above & ~blocked_r & ~blocked_l & (right | left)
    da = jnp.mean(jnp.diff(a))
    return jnp.sum(in_lobe, axis=-1) * da


def sigma_vs_beamwidth(
    R_noise: jnp.ndarray,
    d: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    sigmas: jnp.ndarray,
    mic_dist: float,
    target_deg: float = 90.0,
    c: float = 343.0,
    angles_deg: jnp.ndarray | None = None,
    band_hz: tuple[float, float] = (500.0, 3500.0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The sigma -> beamwidth zoom curve (sigma_vs_beamwidth.png).

    For each sigma: MVDR weights on the given noise field, broadband
    (band-averaged) beam pattern, -3 dB width.

    Returns (sigmas, widths_deg).
    """
    if angles_deg is None:
        angles_deg = jnp.arange(0.0, 180.5, 1.0)
    band = (freqs_hz >= band_hz[0]) & (freqs_hz <= band_hz[1])

    def width_for(sigma):
        w = mvdr_weights(R_noise, d, sigma=sigma)
        pat = beam_pattern(w, freqs_hz, angles_deg, mic_dist, c)  # (A, F)
        broadband = jnp.sum(pat * band, axis=-1) / jnp.sum(band)
        return beamwidth_3db(broadband, angles_deg, target_deg)

    widths = jax.vmap(width_for)(jnp.asarray(sigmas))
    return jnp.asarray(sigmas), widths


def zoom_to_sigma(
    zoom: float | jnp.ndarray,
    sigma_narrow: float = 1e-9,
    sigma_wide: float = 1e-2,
) -> jnp.ndarray:
    """Map a UI zoom level in [0, 1] (0 = wide / zoomed out, 1 = narrow /
    fully zoomed in) to a diagonal-loading sigma, log-interpolated."""
    z = jnp.clip(jnp.asarray(zoom, jnp.float32), 0.0, 1.0)
    log_s = jnp.log10(sigma_wide) + z * (
        jnp.log10(sigma_narrow) - jnp.log10(sigma_wide)
    )
    return 10.0**log_s

"""Blind auto-steered zoom: SRP localization -> steered masked MVDR.

The BASELINE.json configuration "SRP-PHAT localization steering vector from
visual zoom region + MVDR": instead of assuming a broadside target, the
pipeline localizes the strongest source inside a field-of-view window (the
"visual zoom region"), steers the beam there, and enhances blind with the
IPD-deviation mask around the estimated bearing. No ground truth, no model.

One jitted program: SRP scan, argmax-in-FOV, steering, masking, MVDR.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import masked_mvdr
from azoom.config import PipelineConfig
from azoom.dsp.delays import far_field_delays, steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.localize.srp import ipd_angle_histogram
from azoom.masks.geometric import ipd_deviation_noise_mask

__all__ = ["autosteer_enhance"]


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def autosteer_enhance(
    mixture: jnp.ndarray,
    cfg: PipelineConfig,
    fov_center_deg: float = 90.0,
    fov_width_deg: float = 60.0,
    mask_width: float = 0.5,
    length: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Enhance toward the dominant source inside the zoom FOV.

    Args:
      mixture: (M, n) stereo time signal.
      fov_center_deg / fov_width_deg: the visual zoom window; SRP peaks
        outside it are ignored (interferers you are NOT pointing at).

    Returns:
      (enhanced (n,), estimated_angle_deg scalar).
    """
    n = mixture.shape[-1]
    length = n if length is None else length
    Y = stft(mixture, cfg.n_fft, cfg.hop)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)

    # Sparsity-based DOA histogram — resolves multiple talkers where
    # broadband SRP lobes merge on a small 2-mic aperture (see
    # azoom.localize.srp.ipd_angle_histogram).
    angles, hist = ipd_angle_histogram(Y, cfg.mic_dist, cfg.fs, c=cfg.c)
    in_fov = jnp.abs(angles - fov_center_deg) <= fov_width_deg / 2.0
    hist = jnp.where(in_fov, hist, -jnp.inf)
    theta = angles[jnp.argmax(hist)]

    d = steering_vector(freqs, theta, cfg.mic_dist, cfg.c, cfg.n_mics)
    # Expected IPD at the estimated bearing: phase difference of the two
    # steering components.
    tau = far_field_delays(theta, cfg.mic_dist, cfg.c, cfg.n_mics)  # (M,)
    expected_ipd = -2.0 * jnp.pi * freqs * (tau[0] - tau[1])
    noise_mask = ipd_deviation_noise_mask(Y, expected_ipd, width=mask_width)

    S = masked_mvdr(
        Y,
        noise_mask,
        d,
        freqs,
        target_mask=1.0 - noise_mask,
        mask_floor=0.05,
        sigma=cfg.sigma,
        hp_cutoff_hz=cfg.hp_cutoff_hz,
    )
    return istft(S, cfg.n_fft, cfg.hop, length=length), theta

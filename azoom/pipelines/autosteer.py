"""Blind auto-steered zoom: SRP localization -> steered enhancement.

The BASELINE.json configuration "SRP-PHAT localization steering vector from
visual zoom region + MVDR": instead of assuming a broadside target, the
pipeline localizes the strongest source inside a field-of-view window (the
"visual zoom region"), steers the beam there, and enhances blind. With no
model the mask is the IPD-deviation heuristic around the estimated bearing;
with a mask net, the DOA estimate steers the full learned pipeline
(azoom.pipelines.learned) — the camera-driven product path
(scripts/debug_srp.py:44-77 localization + Final_pipeline inference,
composed in one XLA graph).

One jitted program: DOA scan, argmax-in-FOV, steering, masking, beamform.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import masked_mvdr
from azoom.config import PipelineConfig
from azoom.dsp.delays import far_field_delays, steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.localize.srp import ipd_angle_histogram
from azoom.masks.geometric import ipd_deviation_noise_mask

__all__ = ["autosteer_enhance"]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "length", "model", "feature_kind", "beamformer",
                     "use_pallas", "fov_gate", "dsp_precision",
                     "harmonic_regen"),
)
def autosteer_enhance(
    mixture: jnp.ndarray,
    cfg: PipelineConfig,
    fov_center_deg: float = 90.0,
    fov_width_deg: float = 60.0,
    center_prior_deg: float | None = None,
    mask_width: float = 0.5,
    length: int | None = None,
    model=None,
    variables: Any = None,
    feature_kind: str = "logmag_ipd",
    beamformer: str = "mvdr",
    use_pallas: bool = False,
    fov_gate: bool = False,
    train_mic_dist: float | None = None,
    dsp_precision: str = "exact",
    harmonic_regen: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Enhance toward the dominant source inside the zoom FOV.

    Args:
      mixture: (M, n) stereo time signal.
      fov_center_deg / fov_width_deg: the visual zoom window; DOA peaks
        outside it are ignored (interferers you are NOT pointing at).
      center_prior_deg: stddev of a Gaussian aiming prior on the DOA
        histogram, centered at ``fov_center_deg``. The camera center is
        evidence of user intent — autosteer refines a few degrees of
        aiming error, it must not jump to a louder talker deep in the FOV
        (at M=4 with a competing talker 30 deg off-axis at +6 dB, the
        unweighted argmax locks onto the interferer). Default (None) is
        ``fov_width_deg / 5`` — measured on the real 3-talker fixture,
        this is the window where a 20-deg-off target still out-scores
        both a louder interferer 24 deg off-center and the histogram
        noise floor near the center (sigma must be under ~14 deg for the
        first and over ~8 for the second at fov=60). Pass
        ``float("inf")`` for the unweighted loudest-in-FOV behavior.
      model / variables: optional mask net — when given, the estimated
        bearing steers the learned pipeline instead of the IPD heuristic
        (the blind product path: no ground truth, no exact angle, the
        net provides the mask and the DOA histogram provides the
        steering). ``feature_kind``/``beamformer``/``use_pallas`` pass
        through to :func:`azoom.pipelines.learned.learned_enhance`.
      fov_gate: additionally gate the noise covariance by the camera FOV
        (visual-guided covariance gating) in the learned path.

    Returns:
      (enhanced (n,), estimated_angle_deg scalar).
    """
    cfg = cfg.for_input(mixture)
    n = mixture.shape[-1]
    length = n if length is None else length
    Y = stft(mixture, cfg.n_fft, cfg.hop)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)

    # Sparsity-based DOA histogram — resolves multiple talkers where
    # broadband SRP lobes merge on a small 2-mic aperture (see
    # azoom.localize.srp.ipd_angle_histogram). The histogram is a
    # pair-IPD technique built on the linear spacing model; with an
    # EXPLICIT arbitrary geometry the SRP-PHAT scan over the true
    # positions replaces it (same (angles, score) contract).
    if cfg.mic_positions is not None:
        from azoom.localize.srp import srp_map

        angles, hist = srp_map(
            Y, freqs, cfg.mic_dist, c=cfg.c, phat=True,
            positions=cfg.geometry(),
        )
    else:
        angles, hist = ipd_angle_histogram(Y, cfg.mic_dist, cfg.fs, c=cfg.c)
    sigma_p = (fov_width_deg / 5.0 if center_prior_deg is None
               else center_prior_deg)
    prior = jnp.exp(-0.5 * ((angles - fov_center_deg) / sigma_p) ** 2)
    in_fov = jnp.abs(angles - fov_center_deg) <= fov_width_deg / 2.0
    hist = jnp.where(in_fov, hist * prior, -jnp.inf)
    theta = angles[jnp.argmax(hist)]

    if model is not None:
        from azoom.pipelines.learned import learned_enhance

        out = learned_enhance(
            mixture, model, variables, cfg,
            beamformer=beamformer, feature_kind=feature_kind,
            length=length, use_pallas=use_pallas,
            steer_deg=theta,
            fov_deg=fov_width_deg if fov_gate else None,
            train_mic_dist=train_mic_dist,
            dsp_precision=dsp_precision,
            harmonic_regen=harmonic_regen,
        )
        return out, theta

    d = steering_vector(freqs, theta, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
    # Expected IPD at the estimated bearing: phase difference of the two
    # steering components.
    tau = far_field_delays(theta, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())  # (M,)
    expected_ipd = -2.0 * jnp.pi * freqs * (tau[0] - tau[1])
    # First-pair expectation -> first-pair measurement on explicit
    # non-uniform geometries (ADVICE r4; see masks.geometric.ipd).
    pair = "first" if cfg.mic_positions is not None else "mean"
    noise_mask = ipd_deviation_noise_mask(
        Y, expected_ipd, width=mask_width, pair_mode=pair
    )

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

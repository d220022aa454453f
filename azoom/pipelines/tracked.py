"""Tracked zoom: follow a MOVING talker (or a panning camera).

azoom.pipelines.autosteer estimates ONE bearing for the whole utterance —
correct for the reference's static scenes (every world builder pins each
source to a fixed azimuth), wrong the moment the target walks or the
camera pans. This pipeline closes that gap:

  1. chunk the stream (the reference's 2 s / 50 % OLA runtime,
     azoom.stream.chunker);
  2. per-chunk sparsity-based angular spectra
     (azoom.localize.srp.ipd_angle_histogram — one batched program over
     the chunk axis);
  3. a temporal tracker turns the noisy per-chunk spectra into a smooth
     azimuth trajectory (azoom.localize.tracking: Viterbi MAP path by
     default, causal EMA for streaming);
  4. every chunk is enhanced steered at ITS OWN bearing — `steer_deg` is
     traced in azoom.pipelines.learned, so the per-chunk angles ride a
     single vmapped XLA program (no recompiles);
  5. overlap-add.

The camera FOV may itself be a per-chunk trajectory (panning camera):
pass fov_center_deg as a (n_chunks,) array.

Everything — chunking, DOA, tracking, mask net, beamforming, OLA — is one
jitted program per call.
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
from azoom.localize.tracking import causal_track, ema_track, viterbi_track
from azoom.masks.geometric import ipd_deviation_noise_mask
from azoom.stream.chunker import chunk_signal, overlap_add_chunks

__all__ = ["steered_heuristic_enhance", "tracked_autosteer_enhance"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "mask_width", "dsp_precision")
)
def steered_heuristic_enhance(
    chunk: jnp.ndarray,
    cfg: PipelineConfig,
    theta_deg: jnp.ndarray | float,
    mask_width: float = 0.5,
    dsp_precision: str = "exact",
) -> jnp.ndarray:
    """One chunk, heuristically masked and steered at a TRACED bearing:
    the IPD-deviation noise mask around theta + masked MVDR (the autosteer
    heuristic body with the bearing supplied from outside — a tracker, a
    camera, or a vmapped per-chunk trajectory)."""
    cfg = cfg.for_input(chunk)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    Y = stft(chunk, cfg.n_fft, cfg.hop, precision=dsp_precision)
    d = steering_vector(freqs, theta_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
    tau = far_field_delays(theta_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
    expected_ipd = -2.0 * jnp.pi * freqs * (tau[0] - tau[1])
    # The expectation is the FIRST pair's phase; on explicit non-uniform
    # geometries the measurement must come from the same pair (ADVICE r4
    # — mean-adjacent mixing heterogeneous baselines corrupts the mask).
    pair = "first" if cfg.mic_positions is not None else "mean"
    noise_mask = ipd_deviation_noise_mask(
        Y, expected_ipd, width=mask_width, pair_mode=pair
    )
    S = masked_mvdr(
        Y, noise_mask, d, freqs,
        target_mask=1.0 - noise_mask, mask_floor=0.05,
        sigma=cfg.sigma, hp_cutoff_hz=cfg.hp_cutoff_hz,
    )
    return istft(S, cfg.n_fft, cfg.hop, length=chunk.shape[-1],
                 precision=dsp_precision)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "length", "model", "feature_kind", "beamformer", "use_pallas",
        "tracker", "trans_sigma_deg", "fov_width_deg", "mask_width",
        "dsp_precision", "track_lag", "init_prior_sigma_deg",
    ),
)
def tracked_autosteer_enhance(
    mixture: jnp.ndarray,
    cfg: PipelineConfig,
    fov_center_deg: float | jnp.ndarray = 90.0,
    fov_width_deg: float = 60.0,
    tracker: str = "viterbi",
    trans_sigma_deg: float = 12.0,
    mask_width: float = 0.5,
    length: int | None = None,
    model=None,
    variables: Any = None,
    feature_kind: str = "logmag_ipd",
    beamformer: str = "mvdr",
    use_pallas: bool = False,
    train_mic_dist: float | None = None,
    dsp_precision: str = "exact",
    track_lag: int = 0,
    init_prior_sigma_deg: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blind enhancement of a moving target: track its bearing chunk by
    chunk and steer every chunk at its own estimate.

    Args:
      mixture: (M, n) multichannel time signal.
      fov_center_deg: camera look direction — scalar, or (n_chunks,)
        trajectory for a panning camera (n_chunks =
        ceil(max(n - win, 0)/hop) + 1 with win = cfg.win_size,
        hop = win // 2).
      tracker: 'viterbi' (offline MAP path), 'causal' (forward-Viterbi
        filtering — the streaming-compatible choice), 'momentum' /
        'momentum_causal' (direction-state Viterbi, offline/streaming —
        REQUIRED when a second talker's bearing may cross the target's:
        position-only trackers can identity-swap at the crossing), or
        'ema' (legacy causal point filter; can lock onto a wrong early
        peak and never recover — see azoom.localize.tracking).
      trans_sigma_deg: tracker motion-model scale, degrees per chunk hop.
      track_lag / init_prior_sigma_deg: 'causal'-tracker knobs (fixed-lag
        smoothing in chunk hops; camera aiming prior on the first chunk
        — azoom.localize.tracking.causal_track). The prior defaults to
        fov_width_deg / 5 (the static autosteer's scale; measured
        strictly better on the moving study — pass a large sigma to
        effectively disable). Ignored by the other trackers.
      model / variables: optional mask net — steers the learned pipeline
        (azoom.pipelines.learned) at the tracked bearing; without a model
        each chunk uses the IPD-deviation heuristic mask around its
        bearing (the autosteer heuristic, per chunk).

    Returns:
      (enhanced (n,), theta_track (n_chunks,) tracked bearing per chunk).
    """
    cfg = cfg.for_input(mixture)
    n = mixture.shape[-1]
    length = n if length is None else length
    win = cfg.win_size
    hop = win // 2

    chunks, _ = chunk_signal(mixture, win, hop)  # (C, M, W)
    Yc = stft(chunks, cfg.n_fft, cfg.hop, precision=dsp_precision)
    angles, hists = ipd_angle_histogram(Yc, cfg.mic_dist, cfg.fs, c=cfg.c)

    if tracker == "viterbi":
        theta = viterbi_track(
            angles, hists, trans_sigma_deg=trans_sigma_deg,
            fov_center_deg=fov_center_deg, fov_width_deg=fov_width_deg,
        )
    elif tracker == "causal":
        prior = (fov_width_deg / 5.0 if init_prior_sigma_deg is None
                 else init_prior_sigma_deg)
        theta = causal_track(
            angles, hists, trans_sigma_deg=trans_sigma_deg,
            fov_center_deg=fov_center_deg, fov_width_deg=fov_width_deg,
            lag=track_lag, init_prior_sigma_deg=prior,
        )
    elif tracker in ("momentum", "momentum_causal"):
        # Direction-state Viterbi: keeps identity through a bearing
        # CROSSING with a second moving talker (position-only models are
        # provably ambiguous there — azoom.localize.tracking
        # .momentum_track). rate defaults to trans_sigma_deg per hop
        # (a fast-walk step); the aiming prior anchors chunk 0.
        from azoom.localize.tracking import momentum_track

        # Tuned regime (momentum_track docstring): rate just under the
        # admitted per-hop walk speed, sigma ~ rate/2, sticky direction,
        # and a TIGHT aiming prior — the camera is on the talker at zoom
        # start, and a loose prior loses to a louder crossing distractor.
        prior = (8.0 if init_prior_sigma_deg is None
                 else init_prior_sigma_deg)
        theta = momentum_track(
            angles, hists,
            trans_sigma_deg=max(0.4 * trans_sigma_deg, 2.0),
            rate_deg_per_chunk=0.7 * trans_sigma_deg,
            switch_penalty=12.0,
            fov_center_deg=fov_center_deg, fov_width_deg=fov_width_deg,
            causal=(tracker == "momentum_causal"),
            init_prior_sigma_deg=prior,
        )
    elif tracker == "ema":
        theta = ema_track(
            angles, hists, rate_deg_per_chunk=2.0 * trans_sigma_deg,
            fov_center_deg=fov_center_deg, fov_width_deg=fov_width_deg,
        )
    else:
        raise ValueError(f"unknown tracker {tracker!r}")

    if model is not None:
        from azoom.pipelines.learned import learned_enhance

        def process(chunk, th):
            return learned_enhance(
                chunk, model, variables, cfg,
                beamformer=beamformer, feature_kind=feature_kind,
                use_pallas=use_pallas, steer_deg=th,
                train_mic_dist=train_mic_dist,
                dsp_precision=dsp_precision,
            )

    else:

        def process(chunk, th):
            return steered_heuristic_enhance(
                chunk, cfg, th, mask_width=mask_width,
                dsp_precision=dsp_precision,
            )

    processed = jax.vmap(process)(chunks, theta)  # (C, W)
    return overlap_add_chunks(processed, hop, n)[..., :length], theta

"""Oracle mask-driven MVDR pipeline — the end-to-end correctness harness.

TPU-native rebuild of rt_av_zoom/core/oracle_debug.py:27-97 (anechoic IBM)
and oracle_reverb.py:41-171 (reverb, tunable sigma / high-pass, IRM
post-filter). The entire chain — STFT of mixture + ground-truth stems,
Ideal Binary Mask, masked covariance, closed-form 2x2 MVDR with diagonal
loading, spectral post-filter, iSTFT — is ONE jitted XLA program with no
per-bin Python loops, batched over arbitrary leading scene dimensions.

This is the framework's primary integration test: with an oracle mask a
correct engine must reach very high SIR (the reference reports 36.24 dB,
readme.md:23); see tests/test_oracle_pipeline.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import masked_mvdr
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.masks.geometric import hard_geometric_noise_mask
from azoom.masks.oracle import ibm_noise_mask, irm_target_mask

__all__ = ["oracle_enhance", "heuristic_enhance"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "post_filter", "length")
)
def oracle_enhance(
    mixture: jnp.ndarray,
    target_ref: jnp.ndarray,
    interference_ref: jnp.ndarray,
    cfg: PipelineConfig,
    post_filter: str = "binary",
    length: int | None = None,
) -> jnp.ndarray:
    """Enhance with the ground-truth-derived oracle mask.

    Args:
      mixture: (..., M, n) multichannel time-domain mixture.
      target_ref / interference_ref: (..., n) stems as heard at mic 0.
      cfg: static pipeline configuration (closed over at trace time).
      post_filter: 'binary' (oracle_debug.py:82-90), 'irm'
        (oracle_reverb.py:140-156), or 'none'.
      length: output sample count (defaults to the input length).

    Returns:
      (..., n) enhanced mono signal.
    """
    cfg = cfg.for_input(mixture)
    n = mixture.shape[-1]
    length = n if length is None else length

    Y = stft(mixture, cfg.n_fft, cfg.hop)  # (..., M, F, T)
    S_tgt = stft(target_ref, cfg.n_fft, cfg.hop)  # (..., F, T)
    S_int = stft(interference_ref, cfg.n_fft, cfg.hop)

    noise_mask = ibm_noise_mask(S_tgt, S_int)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, cfg.angle_target_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())

    if post_filter == "binary":
        tgt_mask = 1.0 - noise_mask
    elif post_filter == "irm":
        tgt_mask = irm_target_mask(S_tgt, S_int)
    elif post_filter == "none":
        tgt_mask = None
    else:
        raise ValueError(f"unknown post_filter {post_filter!r}")

    S_out = masked_mvdr(
        Y,
        noise_mask,
        d,
        freqs,
        target_mask=tgt_mask,
        sigma=cfg.sigma,
        hp_cutoff_hz=cfg.hp_cutoff_hz,
    )
    return istft(S_out, cfg.n_fft, cfg.hop, length=length)


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def heuristic_enhance(
    mixture: jnp.ndarray,
    cfg: PipelineConfig,
    length: int | None = None,
) -> jnp.ndarray:
    """Blind enhancement with the hard geometric IPD mask — the gen-1
    heuristic path (masked_mvdr.py:50-133). No ground truth needed."""
    cfg = cfg.for_input(mixture)
    n = mixture.shape[-1]
    length = n if length is None else length

    Y = stft(mixture, cfg.n_fft, cfg.hop)
    noise_mask = hard_geometric_noise_mask(Y)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, cfg.angle_target_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())

    S_out = masked_mvdr(
        Y,
        noise_mask,
        d,
        freqs,
        target_mask=1.0 - noise_mask,
        mask_floor=0.05,
        sigma=cfg.sigma,
        hp_cutoff_hz=cfg.hp_cutoff_hz,
    )
    return istft(S_out, cfg.n_fft, cfg.hop, length=length)

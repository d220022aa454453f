"""Frame-latency learned enhancement: causal mask net + online MVDR.

The reference's lowest-latency mode is a 2 s chunk (1 s algorithmic
latency); its roadmap targets lower latency via model changes (TODO:6,
TODO:10 RNN models). This pipeline delivers it: a *unidirectional* BLSTM
mask estimator (causal by construction — frame t sees only frames <= t)
feeds the recursive-covariance online MVDR (azoom.stream.online), so the
system's algorithmic latency is bounded between one STFT hop and one
window: new output is produced every hop (32 ms at 1024/512 @ 16 kHz),
but a sample is only final once the iSTFT overlap-add has seen every
window covering it — worst case one n_fft window (64 ms).

Offline this runs as one jitted program over the full STFT (the causal
structure is in the ops, not the loop); a deployment would carry the LSTM
carry + covariance state across arriving frames.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.masks.features import logmag_ipd_features
from azoom.stream.online import online_masked_mvdr

__all__ = ["online_learned_enhance"]


@functools.partial(
    jax.jit, static_argnames=("model", "cfg", "length", "steer_align")
)
def online_learned_enhance(
    mixture: jnp.ndarray,
    model,
    variables: Any,
    cfg: PipelineConfig,
    forget: float = 0.98,
    mask_floor: float = 0.05,
    length: int | None = None,
    steer_deg: float | jnp.ndarray | None = None,
    steer_align: bool = True,
) -> jnp.ndarray:
    """Causally enhance (M, n) -> (n,) with a causal mask model.

    ``model`` must be causal along the time axis (e.g.
    BLSTMMaskNet(unidirectional=True)); the covariance/beamforming side is
    guaranteed causal by online_masked_mvdr. ``steer_deg`` (traced)
    overrides ``cfg.angle_target_deg``; ``steer_align`` rotates the STFT
    to present the look direction as broadside to the causal net (same
    semantics as azoom.pipelines.learned.learned_enhance — exact no-op at
    90 deg, where the bundled causal artifacts were trained).
    """
    n = mixture.shape[-1]
    length = n if length is None else length
    steer = cfg.angle_target_deg if steer_deg is None else steer_deg

    Y = stft(mixture, cfg.n_fft, cfg.hop)  # (M, F, T)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
    Y_feat = Y * jnp.conj(d).swapaxes(-1, -2)[..., None] if steer_align else Y
    feats = logmag_ipd_features(Y_feat)[None]  # (1, F, T, C)
    tgt_mask = model.apply(variables, feats)[0]  # (F, T)

    S = online_masked_mvdr(
        Y, 1.0 - tgt_mask, d, freqs, cfg.sigma, cfg.hp_cutoff_hz, forget
    )
    S = S * jnp.maximum(tgt_mask, mask_floor)
    return istft(S, cfg.n_fft, cfg.hop, length=length)

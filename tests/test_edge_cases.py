"""Robustness edge cases: silence, zero masks, short inputs, extreme sigma.

The reference handles failure with try/except fallbacks (SURVEY §4 item 6);
azoom's closed forms must stay finite by construction on every degenerate
input."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.beam.mvdr import masked_mvdr
from azoom.beam.nullsteer import hybrid_hard_null_beamform
from azoom.beam.gev import gev_beamform
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.pipelines.oracle import heuristic_enhance, oracle_enhance
from azoom.sim.signals import speech_like

CFG = PipelineConfig(mic_dist=0.04)
FREQS = rfft_freqs(CFG.n_fft, CFG.fs)
D = steering_vector(FREQS, 90.0, CFG.mic_dist)
D_NORM = steering_vector(FREQS, 90.0, CFG.mic_dist, normalize_phase=True)


def _finite(x):
    return bool(jnp.all(jnp.isfinite(x)))


def test_silent_input_all_beamformers():
    """All-zero audio must yield finite (zero-ish) output, never NaN."""
    mix = jnp.zeros((2, 16_000))
    Y = stft(mix, CFG.n_fft, CFG.hop)
    mask = jnp.ones(Y.shape[1:])
    assert _finite(masked_mvdr(Y, mask, D, FREQS))
    assert _finite(hybrid_hard_null_beamform(Y, 1.0 - mask, D_NORM, FREQS))
    assert _finite(gev_beamform(Y, 1.0 - mask))
    out = oracle_enhance(mix, jnp.zeros(16_000), jnp.zeros(16_000), CFG)
    assert _finite(out)


def test_all_zero_noise_mask():
    """Noise mask selecting NO frames (pure-target scene): covariance is
    empty; diagonal loading must keep everything finite."""
    x = speech_like(jax.random.PRNGKey(0), 16_000, CFG.fs)
    Y = stft(jnp.stack([x, x]), CFG.n_fft, CFG.hop)
    mask = jnp.zeros(Y.shape[1:])
    S = masked_mvdr(Y, mask, D, FREQS)
    assert _finite(S)
    S2 = hybrid_hard_null_beamform(Y, jnp.ones(Y.shape[1:]), D_NORM, FREQS)
    assert _finite(S2)


def test_short_input_shorter_than_fft():
    """Inputs shorter than one FFT frame still round-trip (scipy pads)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal(300), jnp.float32)
    Z = stft(x, CFG.n_fft, CFG.hop)
    y = istft(Z, CFG.n_fft, CFG.hop, length=300)
    assert y.shape == (300,)
    assert _finite(y)


def test_extreme_sigma_values():
    x = speech_like(jax.random.PRNGKey(1), 16_000, CFG.fs)
    mix = jnp.stack([x, jnp.roll(x, 3)])
    for sigma in (0.0, 1e-30, 1e6):
        cfg = CFG.replace(sigma=sigma)
        out = heuristic_enhance(mix, cfg)
        assert _finite(out), f"sigma={sigma}"


def test_single_frame_chunk():
    """One STFT frame of context (T=1 after trim) stays well-posed."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1024)),
                    jnp.float32)
    Y = stft(x, CFG.n_fft, CFG.hop)
    mask = jnp.ones(Y.shape[1:]) * 0.5
    assert _finite(masked_mvdr(Y, mask, D, FREQS))

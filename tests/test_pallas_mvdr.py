"""Pallas fused MVDR kernel vs. the XLA reference implementation.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU by bench.py / the verify drive)."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.beam.mvdr import masked_mvdr, mvdr_beamform
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import rfft_freqs, stft
from azoom.masks.oracle import ibm_noise_mask
from azoom.pallas.mvdr_kernel import masked_mvdr_pallas
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04)


def _scene(key=7, n=32_000):
    sigs = speech_like_batch(jax.random.PRNGKey(key), 3, n, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]), CFG.mic_dist, CFG.fs
    )
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    S_t = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_i = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    return Y, ibm_noise_mask(S_t, S_i)


def test_pallas_matches_xla():
    Y, mask = _scene()
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, 90.0, CFG.mic_dist)
    ref = mvdr_beamform(Y, mask, d, freqs, sigma=1e-7)
    ker = masked_mvdr_pallas(Y, mask, d, freqs, sigma=1e-7, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ker.real), np.asarray(ref.real), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ker.imag), np.asarray(ref.imag), rtol=1e-3, atol=2e-4
    )


def test_pallas_postfilter_and_batch():
    Y, mask = _scene(11, 16_000)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, 90.0, CFG.mic_dist)
    Yb = jnp.stack([Y, Y])
    mb = jnp.stack([mask, mask])
    ref = masked_mvdr(
        Yb, mb, d, freqs, target_mask=1.0 - mb, mask_floor=0.05, sigma=1e-6
    )
    ker = masked_mvdr_pallas(
        Yb, mb, d, freqs, target_mask=1.0 - mb, mask_floor=0.05, sigma=1e-6,
        interpret=True,
    )
    assert ker.shape == ref.shape == Yb.shape[:1] + Y.shape[1:]
    np.testing.assert_allclose(
        np.asarray(jnp.abs(ker - ref)).max(), 0.0, atol=5e-4
    )

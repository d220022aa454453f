"""Harmonic-regeneration post-filter (azoom.beam.postfilter).

The reference's roadmap names this stage ("Finalize the harmonic
regeneration post-filter", TODO:9) but contains no code for it; these
tests pin the azoom implementation's contract: rectification evidence
re-opens mask-suppressed harmonic bins, non-harmonic bins are untouched,
and the gain is bracketed by [stage-1, identity].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.beam.postfilter import harmonic_regeneration, min_stats_noise_psd
from azoom.config import PipelineConfig
from azoom.dsp.stft import stft

CFG = PipelineConfig()


def _gated_harmonic(n, fs=16000.0, f0=250.0, n_harm=12, noise=0.01, seed=0):
    """Voiced harmonic comb with speech-like pauses + a stationary floor."""
    t = jnp.arange(n) / fs
    sig = sum(jnp.sin(2 * jnp.pi * f0 * k * t) / k for k in range(1, n_harm + 1))
    env = (jnp.sin(2 * jnp.pi * 1.7 * t) > 0.1).astype(jnp.float32)
    rng = np.random.default_rng(seed)
    return sig * env + noise * jnp.asarray(rng.standard_normal(n))


def test_hrnr_restores_suppressed_harmonic():
    """Hard-suppress the 3rd harmonic's band (g1 = floor): the plain mask
    multiply leaves ~0.2 % of its energy; HRNR restores the bulk of it
    from the rectified stage-1 signal, while a non-harmonic control band
    stays exactly at its stage-1 level."""
    n = 32000
    x = _gated_harmonic(n)
    S = stft(x, CFG.n_fft, CFG.hop)
    F, T = S.shape
    kill = jnp.zeros(F).at[46:51].set(1.0)  # 750 Hz band (bin width 15.625)
    g1 = jnp.ones((F, T)) * (1 - kill[:, None]) + 0.05 * kill[:, None]

    out = harmonic_regeneration(S, g1, CFG.n_fft, CFG.hop, length=n)

    band, ctrl = slice(46, 51), slice(54, 59)
    e_orig = float(jnp.sum(jnp.abs(S)[band] ** 2))
    e_plain = float(jnp.sum(jnp.abs(S * g1)[band] ** 2))
    e_hrnr = float(jnp.sum(jnp.abs(out)[band] ** 2))
    assert e_plain < 0.01 * e_orig          # stage 1 really killed it
    assert e_hrnr > 0.5 * e_orig            # HRNR brought it back
    # between-harmonics control band: nothing to regenerate -> unchanged
    c_plain = float(jnp.sum(jnp.abs(S * g1)[ctrl] ** 2))
    c_hrnr = float(jnp.sum(jnp.abs(out)[ctrl] ** 2))
    assert c_hrnr == pytest.approx(c_plain, rel=0.05)


def test_hrnr_gain_brackets():
    """max(g1, G2) semantics: never below the stage-1 output, never above
    the unmasked beamformed spectrum — on arbitrary (batched) input."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16000)), jnp.float32)
    S = stft(x, CFG.n_fft, CFG.hop)
    g1 = jnp.asarray(rng.uniform(0.05, 1.0, S.shape), jnp.float32)
    out = harmonic_regeneration(S, g1, CFG.n_fft, CFG.hop, length=16000)
    assert out.shape == S.shape
    assert bool(jnp.all(jnp.abs(out) >= jnp.abs(S * g1) - 1e-5))
    assert bool(jnp.all(jnp.abs(out) <= jnp.abs(S) + 1e-5))


def test_hrnr_silence_is_silence():
    S = jnp.zeros((513, 20), jnp.complex64)
    out = harmonic_regeneration(S, jnp.full((513, 20), 0.05), CFG.n_fft,
                                CFG.hop, length=CFG.hop * 19)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out))) == 0.0


def test_min_stats_noise_psd_reads_floor_through_speech():
    """The tracker's bias-corrected low quantile recovers the stationary
    noise level within an order of magnitude even with intermittent
    harmonics on top (gating transients leak a little energy into the low
    quantile), where a plain time-average over-reads by 4-6 orders."""
    n = 32000
    noise = 0.01
    x = _gated_harmonic(n, noise=noise)
    S = stft(x, CFG.n_fft, CFG.hop)
    est = min_stats_noise_psd(S)
    # true per-bin noise PSD of AWGN through this STFT
    rng = np.random.default_rng(99)
    Nt = jnp.mean(
        jnp.abs(stft(noise * jnp.asarray(rng.standard_normal(n)),
                     CFG.n_fft, CFG.hop)) ** 2, axis=-1)
    # harmonic bins (where speech sat on top) still read the floor
    harm_bins = [16, 32, 48, 64, 80]
    for b in harm_bins:
        ratio = float(est[b, 0]) / float(Nt[b])
        assert 0.2 < ratio < 10.0, f"bin {b}: tracker off by {ratio:.1f}x"
        avg_ratio = float(jnp.mean(jnp.abs(S[b]) ** 2)) / float(Nt[b])
        assert avg_ratio > 50.0  # the naive average is hopeless here


@pytest.mark.parametrize(
    "beamformer", ["mvdr", "rmvb", "rtf", "wpd", "hard_null"]
)
def test_learned_enhance_harmonic_regen_all_beamformers(beamformer):
    """harmonic_regen composes with every beamformer branch: finite
    output, right shape, and not the identity (the stage-2 gain differs
    from the plain mask multiply)."""
    from azoom.models.unet import FreqPreservingUNet
    from azoom.pipelines.learned import learned_enhance
    from azoom.sim.farfield import make_scene
    from azoom.train.data import speech_like

    cfg = PipelineConfig(mic_dist=0.04)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    n = 16000
    tgt = speech_like(keys[0], n, cfg.fs)
    itf = speech_like(keys[1], n, cfg.fs)[None]
    scene = make_scene(tgt, itf, 90.0, jnp.asarray([40.0]), cfg.mic_dist,
                       cfg.fs)
    mix = scene["mixture"]

    net = FreqPreservingUNet(base=4)
    v = net.init(keys[2], jnp.zeros((1, 513, 16, 2)))

    out_hr = learned_enhance(mix, net, v, cfg, beamformer=beamformer,
                             harmonic_regen=True)
    assert out_hr.shape == (n,)
    assert bool(jnp.all(jnp.isfinite(out_hr)))
    out_plain = learned_enhance(mix, net, v, cfg, beamformer=beamformer)
    assert float(jnp.max(jnp.abs(out_hr - out_plain))) > 1e-8

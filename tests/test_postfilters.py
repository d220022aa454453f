"""Tests: harmonic regeneration, DUET masks, zoom-study CLI."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.stft import istft, stft
from azoom.eval.projection import osinr_osir
from azoom.masks.duet import bin_doa, duet_masks
from azoom.masks.oracle import ibm_noise_mask
from azoom.masks.postfilter import harmonic_regeneration, spectral_floor
from azoom.beam.mvdr import masked_mvdr
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import rfft_freqs
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04)


def _scene(key=7, n=32_000):
    sigs = speech_like_batch(jax.random.PRNGKey(key), 3, n, CFG.fs)
    return make_scene(
        sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]), CFG.mic_dist, CFG.fs
    )


def test_harmonic_regeneration_improves_or_keeps_sir():
    sc = _scene()
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    S_t = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_i = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    mask = ibm_noise_mask(S_t, S_i)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, 90.0, CFG.mic_dist)
    S_bf = masked_mvdr(Y, mask, d, freqs)  # unmasked beamformer output
    g1 = jnp.maximum(1.0 - mask, 0.05)
    S_hr = harmonic_regeneration(S_bf, g1, CFG.n_fft, CFG.hop, length=32_000)
    out = istft(S_hr, CFG.n_fft, CFG.hop, length=32_000)
    assert np.isfinite(np.asarray(out)).all()
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    # HRNR trades some SIR for fuller harmonics; must stay a large win.
    assert float(sir) - float(sir_in) > 10.0


def test_spectral_floor():
    S = jnp.ones((4, 4), jnp.complex64)
    m = jnp.zeros((4, 4))
    out = spectral_floor(S, m, 0.05)
    np.testing.assert_allclose(np.asarray(out.real), 0.05)


def test_bin_doa_single_source():
    sigs = speech_like_batch(jax.random.PRNGKey(1), 1, 32_000, CFG.fs)
    sc = make_scene(
        sigs[0], jnp.zeros((0, 32_000)), 60.0, jnp.zeros((0,)),
        CFG.mic_dist, CFG.fs,
    )
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    theta, valid = bin_doa(Y, CFG.mic_dist, CFG.fs)
    theta, valid = np.asarray(theta), np.asarray(valid)
    # Energy-weighted valid bins should center near 60 deg.
    w = np.abs(np.asarray(Y[0])) ** 2 * valid
    est = float((theta * w).sum() / w.sum())
    assert abs(est - 60.0) < 8.0


def test_duet_masks_separate():
    sc = _scene(key=21)
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    masks = duet_masks(
        Y, jnp.asarray([90.0, 40.0, 130.0]), CFG.mic_dist, CFG.fs
    )
    assert masks.shape == (3,) + Y.shape[1:]
    m = np.asarray(masks)
    assert m.min() >= 0.0 and m.max() <= 1.0
    # Using the target's DUET mask as a post-filter on mic 0 must improve SIR.
    S_sep = jnp.asarray(m[0]) * Y[0]
    out = istft(S_sep, CFG.n_fft, CFG.hop, length=32_000)
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(sir) > float(sir_in)


def test_zoom_study_cli(tmp_path):
    from azoom.cli.zoom_study import main

    main(["--out", str(tmp_path), "--sigmas", "1e-6", "1e-3"])
    assert (tmp_path / "sigma_vs_beamwidth.png").exists()
    assert (tmp_path / "beam_pattern_Zoom In (Narrow).png").exists()
    assert len(list(tmp_path.glob("beam_pattern_sigma_*.png"))) == 2

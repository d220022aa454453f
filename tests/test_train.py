"""Training subsystem tests: data pipeline shapes, loss decreases, orbax
checkpoint/resume, data-parallel step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.config import PipelineConfig
from azoom.models.unet import FreqPreservingUNet
from azoom.train.data import synth_batch
from azoom.train.loop import bce_loss, create_state, fit, make_train_step

CFG = PipelineConfig(mic_dist=0.04)
SMALL_N = 8_192  # short crops keep CPU tests fast


def test_synth_batch_shapes():
    b = synth_batch(jax.random.PRNGKey(0), 2, CFG, n_samples=SMALL_N)
    Fbins = CFG.n_freqs
    assert b["features"].shape[0] == 2
    assert b["features"].shape[1] == Fbins
    assert b["features"].shape[-1] == 2
    assert b["label"].shape == b["features"].shape[:-1]
    assert b["mixture"].shape[:2] == (2, 2)
    assert set(np.unique(np.asarray(b["label"]))) <= {0.0, 1.0}


def test_synth_batch_physics_features():
    b = synth_batch(
        jax.random.PRNGKey(1), 1, CFG, feature_kind="physics", n_samples=SMALL_N
    )
    assert b["features"].shape[-1] == 4


def test_bce_loss_values():
    assert float(bce_loss(jnp.asarray([1.0, 0.0]), jnp.asarray([1.0, 0.0]))) < 1e-4
    assert float(bce_loss(jnp.asarray([0.5]), jnp.asarray([1.0]))) == pytest.approx(
        float(jnp.log(2.0)), rel=1e-4
    )


def test_train_step_reduces_loss():
    model = FreqPreservingUNet(base=4)
    batch = synth_batch(jax.random.PRNGKey(2), 2, CFG, n_samples=SMALL_N)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    step = make_train_step()
    losses = []
    for _ in range(8):
        state, loss = step(state, batch["features"], batch["label"])
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # overfits one batch


def test_checkpoint_resume(tmp_path):
    model = FreqPreservingUNet(base=2)
    r1 = fit(
        model, CFG, n_steps=3, batch_size=1, n_samples=SMALL_N,
        checkpoint_dir=tmp_path / "ckpt", checkpoint_every=2,
        log_fn=lambda s: None,
    )
    # Resume: only steps 4..5 should run.
    r2 = fit(
        model, CFG, n_steps=5, batch_size=1, n_samples=SMALL_N,
        checkpoint_dir=tmp_path / "ckpt", checkpoint_every=2,
        log_fn=lambda s: None,
    )
    assert r2.steps_run < 5
    assert int(r2.state.step) == 5


def test_data_parallel_train_step(devices8):
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devices8), ("data",))
    model = FreqPreservingUNet(base=2)
    batch = synth_batch(jax.random.PRNGKey(3), 8, CFG, n_samples=SMALL_N)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    step = make_train_step(mesh)
    with mesh:
        state2, loss = step(state, batch["features"], batch["label"])
    assert np.isfinite(float(loss))
    # Sharded result must match the unsharded step numerically.
    state3, loss3 = make_train_step()(state, batch["features"], batch["label"])
    np.testing.assert_allclose(float(loss), float(loss3), rtol=1e-5)


def test_remat_train_step_matches():
    model = FreqPreservingUNet(base=2)
    batch = synth_batch(jax.random.PRNGKey(5), 2, CFG, n_samples=SMALL_N)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    s1, l1 = make_train_step()(state, batch["features"], batch["label"])
    s2, l2 = make_train_step(remat=True)(state, batch["features"], batch["label"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_synth_batch_reverb_mode():
    b = synth_batch(
        jax.random.PRNGKey(7), 2, CFG, n_samples=SMALL_N, reverb=True,
        reverb_max_order=3,
    )
    assert b["features"].shape[0] == 2
    assert np.isfinite(np.asarray(b["features"])).all()
    assert set(np.unique(np.asarray(b["label"]))) <= {0.0, 1.0}
    # Reverb mixtures must differ from the anechoic ones for the same key.
    b0 = synth_batch(jax.random.PRNGKey(7), 2, CFG, n_samples=SMALL_N)
    assert not np.allclose(np.asarray(b["mixture"]), np.asarray(b0["mixture"]))


def test_fit_distillation_blends_teacher_target():
    """fit(teacher_fn=...) must train against the soft blend: with
    alpha=1 and a constant-0.5 teacher the loss is BCE(pred, 0.5), which
    for a fresh (near-0.5) net sits near ln(2) regardless of the oracle
    labels."""
    model = FreqPreservingUNet(base=2)
    res = fit(
        model, CFG, n_steps=2, batch_size=2, n_samples=SMALL_N,
        teacher_fn=lambda f: jnp.full(f.shape[:-1], 0.5),
        distill_alpha=1.0, log_every=1, log_fn=lambda s: None,
    )
    assert res.steps_run == 2
    assert abs(res.losses[-1][1] - float(np.log(2.0))) < 0.05

"""Steer-aligned features: off-broadside zoom with broadside-trained nets.

Every bundled mask net was trained with the target pinned at broadside
(train/data.py TRAIN_ANGLES). learned_enhance(steer_align=True) rotates the
STFT by the conjugate steering vector before feature extraction so the look
direction appears broadside to the net — making "zoom to theta" real for
theta != 90 with zero retraining (RESULTS.md "steer-aligned features";
reference anchor: the steering vector the nets never see,
Final_pipeline/src/inference.py:16-26).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azoom.config import PipelineConfig
from azoom.eval.projection import sir_improvement_db
from azoom.models.pretrained import load_bundled
from azoom.pipelines.learned import learned_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like

CFG = PipelineConfig(mic_dist=0.04)
N = 32_000


@pytest.fixture(scope="module")
def bundled_fpu():
    return load_bundled("fpu")


def _scene(tgt_deg, int_degs):
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    tgt = speech_like(keys[0], N, CFG.fs)
    ints = jnp.stack([speech_like(k, N, CFG.fs) for k in keys[1:]])
    return make_scene(tgt, ints, tgt_deg, jnp.asarray(int_degs),
                      CFG.mic_dist, CFG.fs)


def _sir(out, sc):
    return float(sir_improvement_db(
        out, sc["mixture"][0], sc["target_ref"], sc["interference_ref"]))


def test_alignment_noop_at_broadside(bundled_fpu):
    model, variables, fk = bundled_fpu
    sc = _scene(90.0, (40.0, 130.0))
    outs = [
        learned_enhance(sc["mixture"], model, variables, CFG,
                        feature_kind=fk, steer_deg=90.0, steer_align=al)
        for al in (False, True)
    ]
    # cos(90 deg) in f32 is ~-4e-8, not exactly 0, so the rotation is a
    # float-noise perturbation (amplified slightly through the net's
    # nonlinearities) rather than bit-identical.
    np.testing.assert_allclose(
        np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-3)


def test_off_broadside_zoom_with_broadside_interferer(bundled_fpu):
    """The adversarial case: target 60 deg, an interferer AT broadside.

    Unaligned, the broadside-trained net labels the interferer as target
    (measured +1.6 dB); aligned it recovers the real zoom target
    (measured +19.5 dB on TPU). Thresholds sit well under the measurement.
    """
    model, variables, fk = bundled_fpu
    sc = _scene(60.0, (90.0, 130.0))
    kwargs = dict(feature_kind=fk, steer_deg=60.0)
    base = _sir(learned_enhance(sc["mixture"], model, variables, CFG,
                                steer_align=False, **kwargs), sc)
    alig = _sir(learned_enhance(sc["mixture"], model, variables, CFG,
                                steer_align=True, **kwargs), sc)
    assert alig > base + 8.0
    assert alig > 12.0


def test_online_path_accepts_steer(bundled_fpu):
    from azoom.models.blstm import BLSTMMaskNet
    from azoom.pipelines.online_learned import online_learned_enhance

    model = BLSTMMaskNet(hidden=8, unidirectional=True)
    Y = jnp.zeros((1, CFG.n_fft // 2 + 1, 4, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), Y)
    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16_000)) * 0.1,
        jnp.float32)
    out = online_learned_enhance(mix, model, variables, CFG, steer_deg=60.0)
    assert out.shape == (16_000,)
    assert np.isfinite(np.asarray(out)).all()

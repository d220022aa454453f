"""Q-CNN and PINN-CNN model-family tests (reference roadmap TODO:6
"Add model usage options (RNN-BLSTM, CNN, PINN-CNN, Q-CNN etc)").

The quaternion conv is validated against a direct Hamilton-product
reference implementation (per-quaternion loops, no conv machinery), the
net against the usual shape/range/jit/overfit contract, and the
physics-informed residual against hand-built IPD fields.
"""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.models.qcnn import QCNNMaskNet, QuaternionConv
from azoom.train.data import synth_batch
from azoom.train.loop import (
    create_state,
    make_train_step,
    physics_residual,
)

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

CFG = PipelineConfig(mic_dist=0.04)
SMALL_N = 8_192


def _hamilton(w, q):
    """(wr,wx,wy,wz) x (qr,qx,qy,qz) -> 4-tuple, textbook product."""
    wr, wx, wy, wz = w
    qr, qx, qy, qz = q
    return (
        wr * qr - wx * qx - wy * qy - wz * qz,
        wr * qx + wx * qr + wy * qz - wz * qy,
        wr * qy - wx * qz + wy * qr + wz * qx,
        wr * qz + wx * qy - wy * qx + wz * qr,
    )


def test_quaternion_conv_matches_hamilton_product():
    """A 1x1 QuaternionConv must equal the per-quaternion Hamilton sum
    computed with explicit loops (independent of the kernel-assembly
    trick)."""
    ci, co = 2, 3
    layer = QuaternionConv(co, kernel=(1, 1), use_bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 5, 4 * ci))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y = np.asarray(layer.apply(variables, x))

    p = variables["params"]
    wr, wx, wy, wz = (np.asarray(p[k])[0, 0] for k in ("wr", "wx", "wy", "wz"))
    xn = np.asarray(x)
    expect = np.zeros((1, 4, 5, 4 * co), np.float32)
    for o in range(co):
        acc = [np.zeros(xn.shape[:3], np.float32) for _ in range(4)]
        for i in range(ci):
            q = tuple(xn[..., 4 * i + a] for a in range(4))
            w = (wr[i, o], wx[i, o], wy[i, o], wz[i, o])
            out = _hamilton(w, q)
            for a in range(4):
                acc[a] = acc[a] + out[a]
        for a in range(4):
            expect[..., 4 * o + a] = acc[a]
    np.testing.assert_allclose(y, expect, atol=1e-5)


def test_quaternion_conv_param_sharing():
    """Quaternion mixing uses 1/4 the parameters of the equivalent real
    conv (4ci x 4co real channel map from 4 x ci x co free weights)."""
    layer = QuaternionConv(4, kernel=(3, 3), use_bias=False)
    x = jnp.zeros((1, 8, 8, 8))
    n = sum(
        int(np.prod(v.shape))
        for v in jax.tree_util.tree_leaves(layer.init(jax.random.PRNGKey(0), x))
    )
    real_equiv = 3 * 3 * 8 * 16
    assert n == real_equiv // 4


def test_qcnn_forward_contract():
    model = QCNNMaskNet(base=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 33, 16, 4))
    variables = model.init(jax.random.PRNGKey(1), x)
    mask = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert mask.shape == (1, 33, 16)
    assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0
    assert bool(jnp.all(jnp.isfinite(mask)))


def test_qcnn_overfits_one_batch():
    model = QCNNMaskNet(base=2)
    batch = synth_batch(
        jax.random.PRNGKey(2), 1, CFG, feature_kind="physics",
        n_samples=SMALL_N,
    )
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    step = make_train_step()
    losses = []
    for _ in range(8):
        state, loss = step(state, batch["features"], batch["label"])
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_physics_residual_values():
    """Zero on the broadside manifold, maximal for anti-phase bins, and
    gated by the mask."""
    B, F, T = 1, 4, 3
    feats = np.zeros((B, F, T, 4), np.float32)
    feats[..., 2] = 1.0  # cos(IPD) = 1: on-manifold
    ones = jnp.ones((B, F, T))
    assert float(physics_residual(jnp.asarray(feats), ones, "physics")) == 0.0
    feats[..., 2] = -1.0  # anti-phase
    r = float(physics_residual(jnp.asarray(feats), ones, "physics"))
    assert abs(r - 2.0) < 1e-6
    # mask gating: claiming nothing costs nothing
    zeros = jnp.zeros((B, F, T))
    assert float(physics_residual(jnp.asarray(feats), zeros, "physics")) == 0.0
    # logmag_ipd flavor reads the raw-angle channel
    f2 = np.zeros((B, F, T, 2), np.float32)
    f2[..., 1] = np.pi
    r2 = float(physics_residual(jnp.asarray(f2), ones, "logmag_ipd"))
    assert abs(r2 - 2.0) < 1e-5


def test_pinn_step_trains_and_respects_physics():
    """With the physics term on, training still reduces the total loss,
    and the trained mask's physics residual stays below the plain-BCE
    run's on the same batch (the prior does bite)."""
    from azoom.train.loop import physics_residual as pr

    batch = synth_batch(
        jax.random.PRNGKey(5), 1, CFG, feature_kind="physics",
        n_samples=SMALL_N,
    )
    from azoom.models.unet import FreqPreservingUNet

    def run(weight):
        model = FreqPreservingUNet(base=4)
        state = create_state(
            model, jax.random.PRNGKey(0), batch["features"].shape
        )
        fn = (
            (lambda f, p: weight * pr(f, p, "physics")) if weight else None
        )
        step = make_train_step(physics_fn=fn)
        first = last = None
        for _ in range(8):
            state, loss = step(state, batch["features"], batch["label"])
            first = float(loss) if first is None else first
            last = float(loss)
        mask = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["features"],
        )
        return first, last, float(pr(batch["features"], mask, "physics"))

    f0, l0, res_plain = run(0.0)
    f1, l1, res_pinn = run(1.0)
    assert l0 < f0 and l1 < f1
    assert res_pinn < res_plain

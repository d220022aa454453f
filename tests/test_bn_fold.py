"""Serving-time BatchNorm folding (azoom.models.quantize.fold_batchnorm).

The fold must be EXACT at inference: absorbing gamma/sqrt(var+eps) into
the conv kernel and (bias-mean)*s+beta into the conv bias, then leaving
the BN an identity, is algebra — outputs change only by float rounding.
For the int8 path the per-output-channel symmetric weight scales absorb
the per-channel factor, so the int8 codes are unchanged and the fold is
quantization-cost-free.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.models.quantize import fold_batchnorm
from azoom.models.unet import TPUFPU, FreqPreservingUNet


def _hash(path) -> int:
    # Stable across processes (Python's hash() is salted per run).
    import zlib

    return zlib.crc32("/".join(str(p) for p in path).encode()) % 2**31


def _init(model, shape, seed=0):
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros(shape, jnp.float32))
    # Perturb BN stats away from init so the fold actually does work.
    stats = jax.tree_util.tree_map(lambda x: x, v["batch_stats"])

    def jitter(path, x):
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 1), _hash(path))
        leaf = path[-1].key
        if leaf == "mean":
            return 0.3 * jax.random.normal(key, x.shape)
        if leaf == "var":
            return jnp.exp(0.5 * jax.random.normal(key, x.shape))
        return x

    stats = jax.tree_util.tree_map_with_path(jitter, stats)
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            x + 0.1 * jax.random.normal(jax.random.PRNGKey(_hash(path)), x.shape)
            if path[-1].key in ("scale", "bias") and "BatchNorm" in str(path)
            else x
        ),
        v["params"],
    )
    return {"params": params, "batch_stats": stats}


def _assert_fold_parity(y0, y1, quant):
    y0, y1 = np.asarray(y0), np.asarray(y1)
    if not quant:
        np.testing.assert_allclose(y1, y0, atol=2e-5)
        return
    # Int8 path: the fold is exact per cell, but dynamic activation
    # scales re-round a handful of activation codes when intermediate
    # float values move by 1 ulp — each flip is a full quantization step.
    # Assert distribution-level parity: almost all elements exact, no
    # systematic shift, rare flips bounded.
    d = np.abs(y1 - y0)
    assert np.mean(d > 1e-3) < 0.01, f"too many code flips: {np.mean(d > 1e-3)}"
    assert np.median(d) < 2e-5
    assert np.max(d) < 0.2


@pytest.mark.parametrize("quant", [False, True])
def test_fold_exact_fpu(quant):
    model = FreqPreservingUNet(base=4, quant=quant)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 33, 16, 2))
    v = _init(model, x.shape)
    y0 = model.apply(v, x)
    y1 = model.apply(fold_batchnorm(v), x)
    _assert_fold_parity(y0, y1, quant)


def test_fold_exact_tpufpu_int8():
    model = TPUFPU(base=8, fold=4, quant=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 16, 4))
    v = _init(model, x.shape)
    y0 = model.apply(v, x)
    y1 = model.apply(fold_batchnorm(v), x)
    _assert_fold_parity(y0, y1, quant=True)


def test_fold_is_idempotent():
    model = FreqPreservingUNet(base=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 33, 16, 2))
    v = fold_batchnorm(_init(model, x.shape))
    v2 = fold_batchnorm(v)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_folded_bn_sites_are_identity():
    model = FreqPreservingUNet(base=4)
    v = fold_batchnorm(_init(model, (1, 33, 16, 2)))

    def check(path, x):
        name = "/".join(str(p.key) for p in path)
        if "BatchNorm" in name:
            leaf = path[-1].key
            if leaf == "scale":
                np.testing.assert_array_equal(np.asarray(x), 1.0)
            elif leaf in ("bias", "mean"):
                np.testing.assert_array_equal(np.asarray(x), 0.0)
        return x

    jax.tree_util.tree_map_with_path(check, v["params"])
    jax.tree_util.tree_map_with_path(check, v["batch_stats"])


def test_bundled_artifact_folds_and_serves():
    """load_bundled(fold_bn=True) on the bundled int8 tpufpu artifact.

    Elementwise parity is NOT expected here: with calibrated static
    activation scales the int8 graph is discontinuous — a 1-ulp float
    difference upstream flips an activation code at a rounding boundary,
    and each flip is a full quantization step. The fold is exact per
    Conv->BN cell (verified to 1e-6 by hand during development); what
    must hold end-to-end is distribution-level parity of the mask and
    unchanged enhancement quality."""
    from azoom.config import DEFAULT
    from azoom.eval.projection import sdr_sir
    from azoom.models.pretrained import load_bundled
    from azoom.pipelines.learned import learned_enhance
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like_batch

    model, v_folded, feats = load_bundled("tpufpu", quant=True, fold_bn=True)
    _, v_raw, _ = load_bundled("tpufpu", quant=True, fold_bn=False)

    cfg = DEFAULT.replace(mic_dist=0.04)
    sigs = speech_like_batch(jax.random.PRNGKey(11), 3, 32_000, cfg.fs)
    sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.asarray([40.0, 130.0]),
                    cfg.mic_dist, cfg.fs)

    def run(v):
        out = learned_enhance(sc["mixture"], model, v, cfg, feature_kind=feats)
        _, sir = sdr_sir(out, sc["target_ref"], sc["interference_ref"])
        return np.asarray(out), float(sir)

    out0, sir0 = run(v_raw)
    out1, sir1 = run(v_folded)
    # Same enhancement quality (code-flip jitter only, no systematic shift).
    assert abs(sir1 - sir0) < 0.3, (sir0, sir1)
    rms = float(np.sqrt(np.mean(out0**2))) + 1e-12
    assert float(np.sqrt(np.mean((out1 - out0) ** 2))) < 0.02 * rms

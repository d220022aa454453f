"""Tests: resampling, autosteer zoom pipeline, STFT param search, weight
quantization, profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.params import choose_best_stft_params, stft_reconstruct_mse
from azoom.dsp.resample import resample_fft, resample_poly
from azoom.eval.projection import sir_improvement_db
from azoom.models.quantize import (
    dequantize_variables,
    quantization_error,
    quantize_variables,
    quantized_size_bytes,
)
from azoom.models.unet import FreqPreservingUNet
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

CFG = PipelineConfig(mic_dist=0.04)


def test_resample_fft_tone():
    fs, f0 = 16_000, 440.0
    t = np.arange(16_000) / fs
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t), jnp.float32)
    y = resample_fft(x, 10_000)
    t2 = np.arange(10_000) / 10_000
    expected = np.sin(2 * np.pi * f0 * t2)
    # Ignore edges (circular boundary).
    np.testing.assert_allclose(
        np.asarray(y)[500:-500], expected[500:-500], atol=5e-2
    )


def test_resample_poly_tone():
    fs, f0 = 16_000, 440.0
    t = np.arange(16_000) / fs
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t), jnp.float32)
    y = resample_poly(x, 5, 8)  # 16k -> 10k
    assert y.shape[-1] == 10_000
    t2 = np.arange(10_000) / 10_000
    expected = np.sin(2 * np.pi * f0 * t2)
    np.testing.assert_allclose(np.asarray(y)[500:-500], expected[500:-500], atol=5e-2)


def test_autosteer_finds_and_enhances():
    """Blind zoom: target at 60 deg inside the FOV, interferer at 130 deg
    outside; autosteer must find ~60 and improve SIR."""
    sigs = speech_like_batch(jax.random.PRNGKey(21), 2, 32_000, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1:2], 60.0, jnp.asarray([130.0]), CFG.mic_dist, CFG.fs
    )
    out, theta = autosteer_enhance(
        sc["mixture"], CFG, fov_center_deg=70.0, fov_width_deg=60.0
    )
    assert abs(float(theta) - 60.0) < 12.0
    imp = sir_improvement_db(
        out, sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(imp) > 2.0


def test_stft_param_search(rng):
    x = jnp.asarray(rng.standard_normal(8_000), jnp.float32)
    res = choose_best_stft_params(x)
    assert res["best"] in res["results"]
    for mse in res["results"].values():
        assert mse < 1e-8  # NOLA-satisfying params reconstruct ~exactly
    assert stft_reconstruct_mse(x, 1024, 512) < 1e-10


def test_weight_quantization_roundtrip():
    model = FreqPreservingUNet(base=4)
    x = jnp.zeros((1, 64, 16, 2))
    variables = model.init(jax.random.PRNGKey(0), x)
    q = quantize_variables(variables)
    err = quantization_error(variables, q)
    assert err < 1.0 / 100  # per-channel int8 bound
    # Dequantized model still runs and matches closely.
    deq = dequantize_variables(q)
    y1 = model.apply(variables, x)
    y2 = model.apply(deq, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=5e-2)
    # Payload meaningfully smaller than float32.
    full = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(variables))
    assert quantized_size_bytes(q) < 0.45 * full


def test_profiling_helpers(rng):
    from azoom.utils.profiling import force, realtime_factor, stage_timer, time_fn

    x = jnp.asarray(rng.standard_normal(1_000), jnp.float32)
    f = jax.jit(lambda a: a * 2.0)
    assert force(f(x)) > 0
    dt, out = time_fn(f, x, iters=2)
    assert dt > 0 and out.shape == x.shape
    rtf = realtime_factor(f, x, 16_000, iters=2)
    assert rtf > 0
    st = stage_timer()
    with st.stage("dummy"):
        _ = f(x)
    assert "dummy" in st.report()


def test_quantized_save_load_roundtrip(tmp_path):
    from azoom.models.quantize import load_quantized, save_quantized

    model = FreqPreservingUNet(base=4)
    x = jnp.zeros((1, 64, 16, 2))
    variables = model.init(jax.random.PRNGKey(0), x)
    nbytes = save_quantized(tmp_path / "m.npz", variables)
    assert nbytes > 0
    restored = load_quantized(tmp_path / "m.npz")
    y1 = model.apply(variables, x)
    y2 = model.apply(restored, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=5e-2)


def test_flops_counter():
    from azoom.utils.flops import compiled_flops, roofline_report

    f = lambda a, b: a @ b
    x = jnp.zeros((128, 128), jnp.float32)
    flops = compiled_flops(f, x, x)
    # XLA counts 2*M*N*K FLOPs for a matmul (or 0 if unsupported backend).
    assert flops == 0.0 or abs(flops - 2 * 128**3) / (2 * 128**3) < 0.1
    rep = roofline_report(f, (x, x), measured_seconds=1e-3)
    assert "achieved_tflops" in rep and rep["measured_s"] == 1e-3


def test_resample_poly_odd_lengths():
    """Regression (round 5): for some (n, up, down) the dilated-conv
    output came up one sample short of ceil(n*up/down) and the final
    reshape raised (hit at n=137815, up=20, down=17 while building the
    speed-perturbed corpus). Output length must be exact for arbitrary
    lengths and ratios."""
    rng = np.random.default_rng(3)
    for n in (137_815, 12_345, 7, 1_000):
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        for up, down in ((20, 17), (17, 20), (5, 8), (8, 5), (3, 1)):
            y = resample_poly(x, up, down)
            n_out = -(-n * up // down)
            assert y.shape == (n_out,), (n, up, down, y.shape)
            assert bool(jnp.all(jnp.isfinite(y)))

"""Room simulation tests: ISM physics, Sabine inversion, RT60 behavior,
scene generation with SIR/SNR controls, and the reverb-oracle pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.pipelines.oracle import oracle_enhance
from azoom.sim.room import fft_convolve, inverse_sabine, rir_matrix, shoebox_rir
from azoom.sim.scene import SceneSpec, apply_sir_gain, generate_scene

FS = 16_000


def test_inverse_sabine_reasonable():
    a = inverse_sabine(0.5, (4.9, 4.9, 4.9))
    assert 0.05 < a < 0.5  # cube of ~5 m, RT60 0.5 s


def test_anechoic_rir_is_direct_path():
    """Order 0: single windowed-sinc pulse at dist/c with 1/(4 pi d) gain."""
    src, mic = jnp.asarray([2.45, 3.45, 1.5]), jnp.asarray([2.41, 2.45, 1.5])
    rir = np.asarray(shoebox_rir(src, mic, (4.9, 4.9, 4.9), 1.0, 0, FS, 2048))
    dist = float(jnp.linalg.norm(src - mic))
    peak = np.argmax(np.abs(rir))
    assert abs(peak - dist / 343.0 * FS) < 2
    assert abs(np.sum(rir) - 1.0 / (4 * np.pi * dist)) < 0.02  # DC gain


def test_reverb_rir_decays():
    """Higher order adds energy in a decaying tail."""
    src, mic = jnp.asarray([2.45, 3.45, 1.5]), jnp.asarray([2.41, 2.45, 1.5])
    a = inverse_sabine(0.5, (4.9, 4.9, 4.9))
    rir = np.asarray(shoebox_rir(src, mic, (4.9, 4.9, 4.9), a, 6, FS, 8000))
    e = rir**2
    # With order 6 in a 4.9 m cube the image tail extends to ~100 ms:
    # energy in the first 30 ms >> energy in 60-90 ms > 0 (decaying tail).
    e_early = e[: int(0.03 * FS)].sum()
    e_late = e[int(0.06 * FS) : int(0.09 * FS)].sum()
    assert e_early > 10 * e_late
    assert e_late > 0


def test_rir_matrix_shape():
    sources = jnp.asarray([[2.45, 3.45, 1.5], [3.22, 3.06, 1.5]])
    mics = jnp.asarray([[2.41, 2.45, 1.5], [2.49, 2.45, 1.5]])
    R = rir_matrix(sources, mics, (4.9, 4.9, 4.9), 0.3, 3, FS, 4000)
    assert R.shape == (2, 2, 4000)
    assert np.isfinite(np.asarray(R)).all()


def test_fft_convolve_matches_numpy(rng):
    x = rng.standard_normal(500).astype(np.float32)
    h = rng.standard_normal(64).astype(np.float32)
    y = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(h), 500))
    y_ref = np.convolve(x, h)[:500]
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


def test_apply_sir_gain():
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.standard_normal(4000), jnp.float32)
    interf = jnp.asarray(rng.standard_normal((2, 4000)) * 3.0, jnp.float32)
    scaled = apply_sir_gain(tgt, interf, 0.0)
    p_t = float(jnp.mean(tgt**2))
    p_i = float(jnp.mean(scaled[0] ** 2))
    assert abs(10 * np.log10(p_t / p_i)) < 0.1  # 0 dB SIR achieved


def test_generate_scene_shapes():
    spec = SceneSpec(reverb=True, n_interferers=2, duration_s=1.0)
    sc = generate_scene(jax.random.PRNGKey(0), spec, max_order=3)
    n = 16_000
    assert sc["mixture"].shape == (2, n)
    assert sc["target_ref"].shape == (n,)
    assert sc["interference_ref"].shape == (n,)
    assert float(jnp.max(jnp.abs(sc["mixture"]))) <= 1.0 + 1e-5
    assert np.isfinite(np.asarray(sc["mixture"])).all()


def test_reverb_oracle_pipeline_improves():
    """The gen-1 scientific path (SURVEY §3.3): reverb scene -> oracle IBM
    MVDR must strongly improve SIR even with reflections."""
    spec = SceneSpec(reverb=True, n_interferers=1, duration_s=2.0, snr_db=50.0)
    sc = generate_scene(jax.random.PRNGKey(4), spec, max_order=4)
    cfg = PipelineConfig(mic_dist=0.08, sigma=1e-6)
    out = oracle_enhance(
        sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg,
        post_filter="irm",
    )
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(sir) - float(sir_in) > 8.0

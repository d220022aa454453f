"""M-mic generalization: the degrees-of-freedom study the reference can't run.

The reference is hard-wired to 2 microphones and its readme documents the
consequence (readme.md:19: "blind MVDR fails vs >= 2 interferers" — an
M-mic MVDR has M-1 spatial nulls). azoom's covariance/steering/sim layers
were built (..., M)-shaped from round 1; these tests pin the new pieces —
the unrolled-Cholesky Hermitian solve (azoom.beam.linalgmm), M-channel
scene synthesis, and the end-to-end pipelines at M > 2 — and assert the
physics: extra mics recover the SIR that K >= 2 interferers take away
from a 2-mic array.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.beam.linalg2x2 import solve_2x2_hermitian
from azoom.beam.linalgmm import solve_hermitian, solve_hermitian_small
from azoom.beam.mvdr import mvdr_weights
from azoom.config import PipelineConfig, RoomConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import rfft_freqs
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like


def _random_hpd(key, batch, M, load=0.1):
    """Random complex Hermitian positive-definite batch (batch, M, M)."""
    kr, ki = jax.random.split(key)
    A = jax.random.normal(kr, (batch, M, M)) + 1j * jax.random.normal(
        ki, (batch, M, M)
    )
    A = A.astype(jnp.complex64)
    R = jnp.einsum("bij,bkj->bik", A, jnp.conj(A)) / M
    return R + load * jnp.eye(M, dtype=jnp.complex64)


@pytest.mark.parametrize("M", [3, 4, 6])
def test_solve_hermitian_matches_numpy(M):
    key = jax.random.PRNGKey(M)
    R = _random_hpd(key, 16, M)
    kd_r, kd_i = jax.random.split(jax.random.PRNGKey(100 + M))
    d = (
        jax.random.normal(kd_r, (16, M)) + 1j * jax.random.normal(kd_i, (16, M))
    ).astype(jnp.complex64)
    x = jax.jit(solve_hermitian_small)(R, d)
    x_np = np.linalg.solve(np.asarray(R), np.asarray(d)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=2e-4, atol=2e-4)


def test_solve_hermitian_dispatch_m2_matches_closed_form():
    R = _random_hpd(jax.random.PRNGKey(0), 8, 2)
    kd_r, kd_i = jax.random.split(jax.random.PRNGKey(1))
    d = (
        jax.random.normal(kd_r, (8, 2)) + 1j * jax.random.normal(kd_i, (8, 2))
    ).astype(jnp.complex64)
    np.testing.assert_allclose(
        np.asarray(solve_hermitian(R, d)),
        np.asarray(solve_2x2_hermitian(R, d)),
        rtol=1e-6,
        atol=1e-6,
    )
    # The general unrolled path agrees with the closed form at M=2 too.
    np.testing.assert_allclose(
        np.asarray(solve_hermitian_small(R, d)),
        np.asarray(solve_2x2_hermitian(R, d)),
        rtol=2e-4,
        atol=2e-4,
    )


def test_solve_hermitian_semidefinite_stays_finite():
    # Rank-1 covariance (coherent source, no loading) must not NaN.
    v = jnp.asarray([[1.0 + 0.5j, -0.3 + 1j, 0.2 - 0.1j, 0.7 + 0j]],
                    jnp.complex64)
    R = jnp.einsum("bi,bj->bij", v, jnp.conj(v))
    d = jnp.ones((1, 4), jnp.complex64)
    x = solve_hermitian_small(R, d)
    assert np.all(np.isfinite(np.asarray(x).view(np.float32)))


@pytest.mark.parametrize("M", [2, 4])
def test_mvdr_weights_distortionless_any_m(M):
    cfg = PipelineConfig(n_mics=M, mic_dist=0.04)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, 90.0, cfg.mic_dist, cfg.c, M)
    R = _random_hpd(jax.random.PRNGKey(7), freqs.shape[0], M, load=0.5)
    w = mvdr_weights(R, d, sigma=1e-6)
    gain = jnp.einsum("fm,fm->f", jnp.conj(w), d)
    np.testing.assert_allclose(np.asarray(jnp.abs(gain)), 1.0, atol=1e-3)


def _three_interferer_scene(n_mics, n=16_000):
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    target = speech_like(keys[0], n, 16_000, 150.0)
    interferers = jnp.stack(
        [
            speech_like(keys[1], n, 16_000, 220.0),
            speech_like(keys[2], n, 16_000, 120.0),
            speech_like(keys[3], n, 16_000, 260.0),
        ]
    )
    return make_scene(
        target,
        interferers,
        90.0,
        jnp.asarray([30.0, 135.0, 60.0]),
        0.04,
        16_000.0,
        n_mics=n_mics,
    )


def _pure_mvdr_sir_improvement(n_mics):
    """Oracle-covariance MVDR with NO spectral post-filter: isolates the
    spatial degrees of freedom (the post-filter masks what the beam
    can't null, hiding the DoF wall the reference documents)."""
    from azoom.eval.projection import osinr_osir
    from azoom.pipelines.oracle import oracle_enhance

    sc = _three_interferer_scene(n_mics)
    cfg = PipelineConfig(n_mics=n_mics, mic_dist=0.04, sigma=1e-7)
    out = oracle_enhance(
        sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg,
        post_filter="none",
    )
    _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    return float(sir_out - sir_in)


def test_more_mics_break_the_dof_wall():
    imp2 = _pure_mvdr_sir_improvement(2)
    imp4 = _pure_mvdr_sir_improvement(4)
    imp6 = _pure_mvdr_sir_improvement(6)
    # 3 interferers vs 1 spatial null: the 2-mic beamformer is DoF-starved
    # (readme.md:19); more mics must buy decisive, monotone margins
    # (measured on this fixture: +6.7 / +13.9 / +17.7 dB at M=2/4/6).
    assert imp4 > imp2 + 5.0, (imp2, imp4)
    assert imp6 > imp4 + 2.0, (imp4, imp6)


def test_room_linear_array_shapes_and_pipeline():
    from azoom.sim.scene import simulate_room_scene

    room = RoomConfig().with_linear_array(4, 0.04)
    assert len(room.mic_locs) == 4
    xs = [m[0] for m in room.mic_locs]
    np.testing.assert_allclose(np.diff(xs), 0.04, atol=1e-6)
    # Array center preserved from the original pair.
    assert abs(0.5 * (xs[0] + xs[-1]) - 2.45) < 1e-6

    n = 8_000
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    target = speech_like(keys[0], n, 16_000, 150.0)
    interf = jnp.stack([speech_like(keys[1], n, 16_000, 230.0)])
    sc = simulate_room_scene(
        keys[2], target, interf, room, reverb=True, fs=16_000, snr_db=20.0
    )
    assert sc["mixture"].shape == (4, n)
    assert np.all(np.isfinite(np.asarray(sc["mixture"])))

    from azoom.pipelines.oracle import oracle_enhance

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    out = oracle_enhance(
        sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg
    )
    assert out.shape == (n,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_wpd_runs_at_m4():
    """WPD's stacked (M(taps+1))^2 solve is M-general (jnp.linalg.solve);
    at M=4 with 3 interferers it must run, stay finite, and improve."""
    from azoom.beam.wpd import wpd_beamform
    from azoom.dsp.delays import steering_vector
    from azoom.dsp.stft import istft, rfft_freqs, stft
    from azoom.eval.projection import osinr_osir
    from azoom.masks.oracle import ibm_target_mask

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4)
    Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
    S_t = stft(sc["target_ref"], cfg.n_fft, cfg.hop)
    S_i = stft(sc["interference_ref"], cfg.n_fft, cfg.hop)
    tm = ibm_target_mask(S_t, S_i)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, 90.0, cfg.mic_dist, cfg.c, 4)
    S = wpd_beamform(Y, tm, d, freqs, sigma=cfg.sigma)
    out = istft(S, cfg.n_fft, cfg.hop, length=sc["target_ref"].shape[-1])
    assert np.all(np.isfinite(np.asarray(out)))
    _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(sir_out - sir_in) > 10.0


def test_facade_enhance_at_m4():
    """The product facade at a 4-mic array: AudioZoom(cfg=n_mics=4) routes
    the M-channel mixture through the M-general learned pipeline."""
    from azoom.zoom_api import AudioZoom

    sc = _three_interferer_scene(4, n=32_000)
    zoom = AudioZoom(
        cfg=PipelineConfig(n_mics=4, mic_dist=0.04),
        model="fpu", direction_deg=90.0,
    )
    out = zoom.enhance(np.asarray(sc["mixture"]))
    assert out.shape == (32_000,)
    assert np.all(np.isfinite(out))


def test_cli_full_pipeline_m4(tmp_path):
    """The per-run product CLI at --mics 4: sim writes a 4-channel WAV,
    inf follows the channel count, eval reports a strong oracle SIR."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["PYTHONPATH"] = str(repo)
    r = subprocess.run(
        [sys.executable, "-m", "azoom.cli.run", "full", "--name", "m4",
         "--duration", "1.0", "--mics", "4", "--interferers", "3",
         "--no-reverb", "--beamformer", "oracle"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from azoom.io.wav import read_wav

    mix, _ = read_wav(tmp_path / "data/simulated/m4/mixture.wav")
    assert mix.shape[1] == 4
    report = (tmp_path / "data/results/m4_results/report.txt").read_text()
    imp = float(report.split("SIR IMPROVEMENT:")[1].split("dB")[0])
    assert imp > 10.0, report


def test_sweep_runs_at_m4():
    from azoom.parallel.sweep import oracle_sweep

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    res = oracle_sweep(
        jax.random.PRNGKey(5), cfg, n_scenes=4, n_samples=8_000,
        n_interferers=3, reverb=False, randomize=True, with_stoi=False,
    )
    imp = np.asarray(res["sir_imp"])
    assert imp.shape == (4,)
    assert np.all(np.isfinite(imp))
    assert imp.mean() > 10.0


@pytest.mark.parametrize("M", [3, 4])
def test_gev_power_iteration_matches_numpy(M):
    """The whitened power iteration recovers the principal generalized
    eigenvector of (R_tgt, R_noise) (up to complex phase) at M > 2."""
    from azoom.beam.gev import gev_principal_power

    kt, kn = jax.random.split(jax.random.PRNGKey(40 + M))
    Rt = _random_hpd(kt, 8, M, load=0.05)
    Rn = _random_hpd(kn, 8, M, load=0.3)
    v = np.asarray(gev_principal_power(Rt, Rn, iters=40))
    A = np.linalg.solve(np.asarray(Rn), np.asarray(Rt))
    lam, vec = np.linalg.eig(A)
    idx = np.argmax(np.abs(lam), axis=-1)
    v_np = np.take_along_axis(vec, idx[:, None, None], axis=-1)[..., 0]
    v_np = v_np / np.linalg.norm(v_np, axis=-1, keepdims=True)
    # Align complex phase per batch element, then compare.
    phase = np.sum(np.conj(v_np) * v, axis=-1)
    phase = phase / (np.abs(phase) + 1e-30)
    np.testing.assert_allclose(v, v_np * phase[:, None], rtol=2e-3, atol=2e-3)


def test_gev_beamform_runs_at_m4():
    """Mask-driven GEV at M=4 vs M=2 on a 3-interferer scene: runs, stays
    finite, and the extra degrees of freedom must not hurt."""
    from azoom.beam.gev import gev_beamform
    from azoom.dsp.stft import istft, stft
    from azoom.eval.projection import osinr_osir
    from azoom.masks.oracle import ibm_target_mask

    def run(n_mics):
        cfg = PipelineConfig(n_mics=n_mics, mic_dist=0.04)
        sc = _three_interferer_scene(n_mics)
        Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
        S_t = stft(sc["target_ref"], cfg.n_fft, cfg.hop)
        S_i = stft(sc["interference_ref"], cfg.n_fft, cfg.hop)
        tgt_mask = ibm_target_mask(S_t, S_i)
        S = gev_beamform(Y, tgt_mask)
        out = istft(S, cfg.n_fft, cfg.hop, length=sc["target_ref"].shape[-1])
        assert np.all(np.isfinite(np.asarray(out)))
        _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
        _, sir_in = osinr_osir(
            sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
        )
        return float(sir_out - sir_in)

    imp2, imp4 = run(2), run(4)
    assert imp4 > 10.0, (imp2, imp4)
    assert imp4 > imp2 - 1.0, (imp2, imp4)


def test_online_path_runs_at_m4():
    """The causal per-frame recursive-covariance MVDR is M-general too
    (stream/online.py dispatches through azoom.beam.linalgmm)."""
    from azoom.eval.projection import osinr_osir
    from azoom.masks.oracle import ibm_noise_mask

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4, n=16_000)

    from azoom.dsp.stft import stft
    from azoom.stream.online import online_enhance

    S_t = stft(sc["target_ref"], cfg.n_fft, cfg.hop)
    S_i = stft(sc["interference_ref"], cfg.n_fft, cfg.hop)
    noise_mask = ibm_noise_mask(S_t, S_i)
    out = online_enhance(sc["mixture"], noise_mask, cfg)
    assert out.shape == sc["target_ref"].shape
    assert np.all(np.isfinite(np.asarray(out)))
    _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(sir_out - sir_in) > 10.0


def test_rtf_geometry_free_at_m4():
    """RTF-steered MVDR at M=4 (whitened power iteration): with oracle
    masks and NO geometry input it must run, stay finite, report high
    confidence for the coherent target, and beamform strongly."""
    from azoom.beam.rtf import rtf_from_covariances, rtf_mvdr_beamform
    from azoom.beam.covariance import masked_covariance
    from azoom.dsp.stft import istft, rfft_freqs, stft
    from azoom.eval.projection import osinr_osir
    from azoom.masks.oracle import ibm_noise_mask

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4)
    Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
    S_t = stft(sc["target_ref"], cfg.n_fft, cfg.hop)
    S_i = stft(sc["interference_ref"], cfg.n_fft, cfg.hop)
    nm = ibm_noise_mask(S_t, S_i)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)

    # Confidence sanity: the masked pencil of a coherent target should be
    # judged anisotropic in the speech band.
    a, conf = rtf_from_covariances(
        masked_covariance(Y, 1.0 - nm), masked_covariance(Y, nm)
    )
    assert a.shape == (freqs.shape[0], 4)
    band = (np.asarray(freqs) > 200) & (np.asarray(freqs) < 3000)
    assert float(np.median(np.asarray(conf)[band])) > 0.5
    # RTF is reference-normalized: |a0| = 1 wherever the target is audible
    # at the reference mic, < 1 only where the ref_floor magnitude cap
    # engages (documented semantics) — never above, never NaN.
    a0 = np.abs(np.asarray(a)[band, 0])
    assert np.all(np.isfinite(a0))
    assert float(a0.max()) <= 1.0 + 1e-3
    assert float(np.median(a0)) == pytest.approx(1.0, abs=1e-3)

    S = rtf_mvdr_beamform(Y, nm, freqs, target_mask=1.0 - nm,
                          sigma=cfg.sigma)
    out = istft(S, cfg.n_fft, cfg.hop, length=sc["target_ref"].shape[-1])
    assert np.all(np.isfinite(np.asarray(out)))
    _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(sir_out - sir_in) > 10.0


def test_rtf_m2_closed_form_unchanged():
    """The M=2 closed-form pencil path must be bit-stable under the
    M-general refactor (trace via jnp.trace instead of explicit sum)."""
    from azoom.beam.rtf import rtf_from_covariances

    kt, kn = jax.random.split(jax.random.PRNGKey(3))
    Rt = _random_hpd(kt, 16, 2, load=0.01)
    Rn = _random_hpd(kn, 16, 2, load=0.2)
    a, conf = rtf_from_covariances(Rt, Rn)
    assert np.all(np.isfinite(np.asarray(a).view(np.float32)))
    assert np.all((np.asarray(conf) >= 0) & (np.asarray(conf) <= 1))


def test_lowlat_stream_runs_at_m4():
    """Hop-granularity streaming (the low-latency product path) on a
    4-mic array: the step's solve dispatches through linalgmm."""
    from azoom.models.pretrained import load_pretrained_crn_causal
    from azoom.stream.lowlat import OnlineEnhancer

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4)
    model, variables = load_pretrained_crn_causal()
    oe = OnlineEnhancer(cfg, model, variables, steer_deg=90.0)
    mix = np.asarray(sc["mixture"])
    outs = [oe.push(mix[:, i:i + 4096]) for i in range(0, mix.shape[1], 4096)]
    out = np.concatenate(outs)
    assert out.size > 0
    assert np.all(np.isfinite(out))


def test_learned_pipeline_runs_at_m4():
    """The mask nets read features from the first mic pair; the MVDR uses
    all M channels — the composition must run and stay finite."""
    from azoom.models.unet import FreqPreservingUNet
    from azoom.pipelines.learned import learned_enhance

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4, n=8_000)
    model = FreqPreservingUNet(base=4)
    feats_shape = (1, cfg.n_freqs, 32, 2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(feats_shape))
    out = learned_enhance(sc["mixture"], model, variables, cfg,
                          feature_kind="logmag_ipd")
    assert out.shape == sc["target_ref"].shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("M", [3, 4, 6, 8])
def test_eigh_hermitian_small_vs_numpy(M):
    """Unrolled cyclic-Jacobi EVD: eigvals, reconstruction, and unitarity
    against numpy.linalg.eigh at float32 tolerance."""
    from azoom.beam.linalgmm import eigh_hermitian_small

    R = _random_hpd(jax.random.PRNGKey(20 + M), 32, M, load=0.01)
    ev, U = jax.jit(eigh_hermitian_small)(R)
    R_np, ev, U = np.asarray(R), np.asarray(ev), np.asarray(U)
    ev_np = np.linalg.eigvalsh(R_np)
    scale = np.abs(ev_np).max(axis=-1, keepdims=True)
    np.testing.assert_allclose(ev / scale, ev_np / scale, atol=1e-5)
    rec = np.einsum("bij,bj,bkj->bik", U, ev, U.conj())
    assert np.abs(rec - R_np).max() / scale.max() < 1e-5
    UhU = np.einsum("bji,bjk->bik", U.conj(), U)
    assert np.abs(UhU - np.eye(M)).max() < 1e-5


def test_eigh_hermitian_small_m2_is_closed_form():
    from azoom.beam.linalg2x2 import eigh_2x2_hermitian
    from azoom.beam.linalgmm import eigh_hermitian_small

    R = _random_hpd(jax.random.PRNGKey(5), 8, 2)
    ev_a, U_a = eigh_hermitian_small(R)
    ev_b, U_b = eigh_2x2_hermitian(R)
    np.testing.assert_array_equal(np.asarray(ev_a), np.asarray(ev_b))
    np.testing.assert_array_equal(np.asarray(U_a), np.asarray(U_b))


def _nullsteer_physical_study(mic_dist, f0s, n_nulls_list):
    """Physical (per-stem image) measurement of the M=4 multi-null
    beamformer: apply the weights to the target-only and
    interference-only multichannel images. The projection metrics
    (osinr_osir) project residual interference onto the 1-D summed-ref
    direction, so FILTERED residue escapes into the noise term and
    cross-beamformer comparisons mislead — this decomposition is the
    ground truth the design decisions in azoom.beam.nullsteer were made
    against."""
    from azoom.beam.covariance import masked_covariance
    from azoom.beam.nullsteer import hard_null_weights
    from azoom.dsp.stft import stft
    from azoom.masks.oracle import ibm_noise_mask

    cfg = PipelineConfig(n_mics=4, mic_dist=mic_dist)
    n = 16_000
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    target = speech_like(keys[0], n, 16_000, f0s[0])
    ints = jnp.stack([speech_like(keys[i + 1], n, 16_000, f0s[i + 1])
                      for i in range(3)])
    zero3 = jnp.zeros((3, n))
    args = (90.0, jnp.asarray([30.0, 135.0, 60.0]), mic_dist, 16_000.0)
    sc_t = make_scene(target, zero3, *args, n_mics=4, normalize=False)
    sc_full = make_scene(target, ints, *args, n_mics=4, normalize=False)
    sc_i = make_scene(jnp.zeros((n,)), ints, *args, n_mics=4,
                      normalize=False)
    Y = stft(sc_full["mixture"], cfg.n_fft, cfg.hop)
    Yt = stft(sc_t["mixture"], cfg.n_fft, cfg.hop)
    Yi = stft(sc_i["mixture"], cfg.n_fft, cfg.hop)
    nm = ibm_noise_mask(
        stft(sc_full["target_ref"], cfg.n_fft, cfg.hop),
        stft(sc_full["interference_ref"], cfg.n_fft, cfg.hop),
    )
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, 90.0, mic_dist, cfg.c, 4,
                        normalize_phase=True)
    R_int = masked_covariance(Y, nm)
    pt_in = float(jnp.sum(jnp.abs(Yt[0]) ** 2))
    pi_in = float(jnp.sum(jnp.abs(Yi[0]) ** 2))
    pw = np.asarray(jnp.sum(jnp.abs(Yi[0]) ** 2, axis=-1))
    pw = pw / pw.sum()
    rows = {}
    for J in n_nulls_list:
        w = hard_null_weights(R_int, d, n_nulls=J)
        assert np.all(np.isfinite(np.asarray(w).view(np.float32)))
        St = jnp.einsum("fm,mft->ft", jnp.conj(w), Yt)
        Si = jnp.einsum("fm,mft->ft", jnp.conj(w), Yi)
        pt = float(jnp.sum(jnp.abs(St) ** 2))
        pi = float(jnp.sum(jnp.abs(Si) ** 2))
        rows[J] = {
            "tgt_db": 10 * np.log10(pt / pt_in),
            "sir_db": 10 * np.log10(pt / pi) - 10 * np.log10(pt_in / pi_in),
            # interference-energy-weighted WNG relative to delay-and-sum
            "wng_db": 10 * np.log10(
                float((np.asarray(jnp.sum(jnp.abs(w) ** 2, -1)) * pw).sum())
                * 4
            ),
        }
    return rows


def test_hard_null_multinull_at_m4_separable():
    """M=4 norm-constrained LCMV on a spatially separable scene (8 cm
    array, higher-f0 sources): multi-null beats single-null, the target
    is exactly preserved (unit-gain renormalization), and the weights
    respect the +10 dB white-noise-gain budget."""
    rows = _nullsteer_physical_study(0.08, (300.0, 420.0, 360.0, 500.0),
                                     (1, 2))
    for J, r in rows.items():
        assert abs(r["tgt_db"]) < 0.1, (J, r)
        assert r["wng_db"] < 10.5, (J, r)
        assert r["sir_db"] > 0.5, (J, r)
    assert rows[2]["sir_db"] > rows[1]["sir_db"] + 1.0, rows


def test_hard_null_multinull_congested_is_safe():
    """The hostile case the design guards against: a 4 cm array with
    speech-band energy, where every steering vector is near the target's
    at the energetic bins. Unconstrained eigvec nulls measured -2.3 dB
    SIR at +22 dB WNG here; the constrained design must stay
    net-positive, target-transparent, and inside the WNG budget at every
    n_nulls."""
    rows = _nullsteer_physical_study(0.04, (150.0, 220.0, 120.0, 260.0),
                                     (1, 2, 3))
    for J, r in rows.items():
        assert abs(r["tgt_db"]) < 0.1, (J, r)
        assert r["wng_db"] < 10.5, (J, r)
        assert r["sir_db"] > 0.0, (J, r)


def test_rmvb_m4_protects_mismatched_target():
    """Li-Stoica-Wang RCB at M=4 through the Jacobi EVD: SOI-dominant
    covariance with a mismatched nominal steering — RCB must restore
    near-unity target gain where plain MVDR self-cancels (the same
    contract tests/test_rmvb.py pins at M=2)."""
    from azoom.beam.rmvb import rmvb_weights

    phase_true = np.exp(1j * 0.3 * np.arange(4))
    phase_nom = np.exp(1j * 0.45 * np.arange(4))
    a = phase_true
    dn = phase_nom
    bi = np.exp(1j * -1.2 * np.arange(4))
    R = (
        10 * np.outer(a, a.conj())
        + np.outer(bi, bi.conj())
        + 0.01 * np.eye(4)
    )
    Rj = jnp.asarray(R[None], jnp.complex64)
    dj = jnp.asarray(dn[None], jnp.complex64)
    w_r = np.asarray(rmvb_weights(Rj, dj, 0.5, 1e-7))[0]
    w_m = np.asarray(mvdr_weights(Rj, dj, 1e-7))[0]
    assert np.all(np.isfinite(w_r.view(np.float32)))

    def gains(w):
        return abs(np.vdot(w, a)), abs(np.vdot(w, bi))

    gt_r, gi_r = gains(w_r)
    gt_m, gi_m = gains(w_m)
    assert abs(gt_r - 1.0) < 0.1  # target protected
    assert gt_r > gt_m + 0.1  # mismatch-MVDR loses target gain
    assert gi_r < 0.35  # interferer suppressed (>-9 dB at unit target gain)


def test_rmvb_beamforms_at_m4():
    """Masked RMVB end-to-end on a 4-mic 3-interferer scene: finite and
    strongly improving."""
    from azoom.beam.rmvb import rmvb_beamform
    from azoom.dsp.stft import istft, stft
    from azoom.eval.projection import osinr_osir
    from azoom.masks.oracle import ibm_noise_mask

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4)
    Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
    nm = ibm_noise_mask(
        stft(sc["target_ref"], cfg.n_fft, cfg.hop),
        stft(sc["interference_ref"], cfg.n_fft, cfg.hop),
    )
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, 90.0, cfg.mic_dist, cfg.c, 4)
    S = rmvb_beamform(Y, nm, d, freqs, sigma=cfg.sigma) * (1.0 - nm)
    out = istft(S, cfg.n_fft, cfg.hop, length=sc["target_ref"].shape[-1])
    assert np.all(np.isfinite(np.asarray(out)))
    _, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(sir_out - sir_in) > 10.0


def test_doa_histogram_and_autosteer_at_m4():
    """Blind product path at M=4: the IPD-histogram DOA (now coherently
    averaged over all adjacent pairs) localizes the in-FOV talker, and
    autosteer_enhance runs the full camera->DOA->enhance chain finite."""
    from azoom.localize.srp import ipd_angle_histogram
    from azoom.dsp.stft import stft
    from azoom.pipelines.autosteer import autosteer_enhance

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    sc = _three_interferer_scene(4)
    Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
    angles, hist = ipd_angle_histogram(Y, cfg.mic_dist, cfg.fs)
    fov = (np.asarray(angles) > 75) & (np.asarray(angles) < 105)
    h = np.asarray(hist)
    peak = float(np.asarray(angles)[fov][np.argmax(h[fov])])
    assert abs(peak - 90.0) < 8.0, peak

    out, theta = autosteer_enhance(sc["mixture"], cfg, fov_center_deg=95.0,
                                   fov_width_deg=40.0)
    assert np.all(np.isfinite(np.asarray(out)))
    assert 75.0 <= float(theta) <= 115.0


def test_heuristic_blind_path_gains_from_m4():
    """The geometric IPD mask reads the averaged cross-spectrum at M>2
    (masks.geometric.ipd / masks.duet.bin_doa): the fully blind heuristic
    pipeline must beat its own 2-mic result on the same scene."""
    from azoom.eval.projection import osinr_osir
    from azoom.pipelines.oracle import heuristic_enhance

    gains = {}
    for M in (2, 4):
        cfg = PipelineConfig(n_mics=M, mic_dist=0.04)
        sc = _three_interferer_scene(M, n=32_000)
        out = heuristic_enhance(sc["mixture"], cfg)
        _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
        _, sir_in = osinr_osir(
            sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
        )
        gains[M] = float(sir - sir_in)
    assert gains[4] > gains[2] + 3.0, gains

"""RMVB (Robust Capon) beamformer — reference roadmap TODO:9.

Validation: exact weight parity with an independent NumPy brute-force
solution of the Li-Stoica-Wang RCB (scipy root-find + linalg.solve),
target-protection in its native regime (SOI-containing covariance under
steering mismatch), and pipeline sanity in the masked setting (where the
noise-only covariance already prevents self-cancellation, so RCB must be
within ~1.5 dB of plain MVDR — the measured finding recorded in
PARITY.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.beam.mvdr import mvdr_weights
from azoom.beam.rmvb import rmvb_beamform, rmvb_weights
from azoom.config import PipelineConfig

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

CFG = PipelineConfig(mic_dist=0.04)


def _brute_force_rcb(R, dn, eps):
    import scipy.optimize as so

    gam, U = np.linalg.eigh(R)
    b = U.conj().T @ dn

    def g(lam):
        return np.sum(np.abs(b) ** 2 / (1 + lam * gam) ** 2) - eps

    lam = so.brentq(g, 0, 1e12)
    a_hat = dn - np.linalg.solve(np.eye(2) + lam * R, dn)
    a_hat *= np.sqrt(np.vdot(dn, dn).real / np.vdot(a_hat, a_hat).real)
    w = np.linalg.solve(R + 1e-7 * np.eye(2), a_hat)
    return w / np.vdot(a_hat, w)


def test_rmvb_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(8):
        phases = rng.uniform(-np.pi, np.pi, 3)
        a = np.array([1.0, np.exp(1j * phases[0])])
        dn = np.array([1.0, np.exp(1j * phases[1])])
        bi = np.array([1.0, np.exp(1j * phases[2])])
        p = rng.uniform(0.5, 20.0, 2)
        R = (
            p[0] * np.outer(a, a.conj())
            + p[1] * np.outer(bi, bi.conj())
            + 0.01 * np.eye(2)
        )
        w = np.asarray(
            rmvb_weights(
                jnp.asarray(R[None], jnp.complex64),
                jnp.asarray(dn[None], jnp.complex64),
                0.5,
                1e-7,
            )
        )[0]
        w_ref = _brute_force_rcb(R, dn, 0.5)
        assert np.max(np.abs(w - w_ref)) < 5e-3 * np.max(np.abs(w_ref)), trial


def test_rmvb_protects_mismatched_target():
    """Native RCB regime: SOI-dominant covariance, nominal steering off the
    true target direction. RCB must restore near-unity target gain and
    suppress the interferer harder than mismatch-MVDR."""
    a = np.array([1.0, np.exp(1j * 0.3)])
    dn = np.array([1.0, np.exp(1j * 0.45)])  # mismatched look direction
    bi = np.array([1.0, np.exp(1j * -1.2)])
    R = 10 * np.outer(a, a.conj()) + np.outer(bi, bi.conj()) + 0.01 * np.eye(2)
    Rj = jnp.asarray(R[None], jnp.complex64)
    dj = jnp.asarray(dn[None], jnp.complex64)
    w_r = np.asarray(rmvb_weights(Rj, dj, 0.5, 1e-7))[0]
    w_m = np.asarray(mvdr_weights(Rj, dj, 1e-7))[0]

    def gains(w):
        return abs(np.vdot(w, a)), abs(np.vdot(w, bi))

    gt_r, gi_r = gains(w_r)
    gt_m, gi_m = gains(w_m)
    assert abs(gt_r - 1.0) < 0.05  # target protected
    assert gt_r > gt_m + 0.1  # mismatch-MVDR loses target gain
    assert gi_r < gi_m  # and RCB still suppresses the interferer harder


def test_rmvb_pipeline_sanity():
    """Masked setting: the noise-only covariance already prevents
    self-cancellation, so masked-RMVB must track masked-MVDR within
    1.5 dB (the dominance-blended correction must not hurt)."""
    from azoom.beam.mvdr import mvdr_beamform
    from azoom.dsp.delays import steering_vector
    from azoom.dsp.stft import istft, rfft_freqs, stft
    from azoom.eval.projection import sdr_sir
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like

    N = 32_000
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    sc = make_scene(
        speech_like(k1, N, CFG.fs, 150.0),
        speech_like(k2, N, CFG.fs, 210.0)[None],
        84.0, jnp.asarray([40.0]), CFG.mic_dist, CFG.fs,
    )
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    S_t = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_i = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    noise = (jnp.abs(S_i) > jnp.abs(S_t)).astype(jnp.float32)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, 90.0, CFG.mic_dist, CFG.c, CFG.n_mics)
    outs = {}
    for name, fn in (("mvdr", mvdr_beamform), ("rmvb", rmvb_beamform)):
        S = fn(Y, noise, d, freqs, sigma=CFG.sigma)
        out = istft(S, CFG.n_fft, CFG.hop, length=N)
        assert np.isfinite(np.asarray(out)).all()
        _, sir = sdr_sir(out, sc["target_ref"], sc["interference_ref"])
        outs[name] = float(sir)
    assert outs["rmvb"] > outs["mvdr"] - 1.5, outs
    assert outs["rmvb"] > 15.0


def test_learned_sweep_steer_error():
    """Camera pointing error axis: scenes keep the true target angle, the
    enhancement stack is steered off it. The sweep must stay finite and
    still enhance; zero error must reproduce the default path exactly."""
    from azoom.models.pretrained import load_pretrained_fpu
    from azoom.parallel.sweep import learned_sweep, sweep_summary

    model, variables = load_pretrained_fpu()
    common = dict(
        n_scenes=2, n_samples=8_192, reverb=False, randomize=False,
        with_stoi=False,
    )
    base = learned_sweep(
        jax.random.PRNGKey(4), CFG, model, variables, **common
    )
    zero = learned_sweep(
        jax.random.PRNGKey(4), CFG, model, variables,
        steer_error_deg=0.0, **common
    )
    assert float(jnp.max(jnp.abs(base["sir_imp"] - zero["sir_imp"]))) == 0.0
    for bf in ("mvdr", "rmvb"):
        res = learned_sweep(
            jax.random.PRNGKey(4), CFG, model, variables,
            beamformer=bf, steer_error_deg=12.0, **common
        )
        s = sweep_summary(res)
        assert s["sir_imp"]["n_failed"] == 0
        assert s["sir_imp"]["mean"] > 3.0, (bf, s["sir_imp"])

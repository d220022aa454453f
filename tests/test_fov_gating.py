"""Visual-guided covariance gating (reference roadmap TODO:12).

The camera FOV gates which TF bins feed the noise covariance: spatial cues
confidently outside the zoom region are added as interference, and a
protection cone around the look direction keeps target-dominated bins out
of the covariance (no MPDR-style self-cancellation when the camera
direction is only approximately right).
"""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.beam.mvdr import masked_mvdr
from azoom.eval.projection import sdr_sir
from azoom.masks.geometric import apply_fov_gate, fov_noise_gate
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

CFG = PipelineConfig(mic_dist=0.04)
N = 32_000


def _scene(key, tgt_deg=90.0, itf_deg=(40.0,)):
    keys = jax.random.split(key, 1 + len(itf_deg))
    tgt = speech_like(keys[0], N, CFG.fs, 150.0)
    f0s = (210.0, 120.0)
    itf = jnp.stack(
        [speech_like(k, N, CFG.fs, f0) for k, f0 in zip(keys[1:], f0s)]
    )
    return make_scene(
        tgt, itf, tgt_deg, jnp.asarray(itf_deg), CFG.mic_dist, CFG.fs
    )


def test_gate_separates_inside_from_outside():
    """Energy-weighted gate ~0 for a target inside the FOV, ~1 for an
    interferer outside it; gate agrees with the oracle IBM on >85% of the
    mixture's valid-cue energy."""
    key = jax.random.PRNGKey(0)

    def weighted_gate(mixture):
        Y = stft(mixture, CFG.n_fft, CFG.hop)
        gate, _, valid = fov_noise_gate(Y, 90.0, 40.0, CFG.mic_dist, CFG.fs)
        e = jnp.abs(Y[0]) ** 2 * valid
        return float(jnp.sum(gate * e) / jnp.sum(e))

    tgt_only = make_scene(
        speech_like(key, N, CFG.fs, 150.0), jnp.zeros((1, N)), 90.0,
        jnp.asarray([40.0]), CFG.mic_dist, CFG.fs,
    )
    itf_only = make_scene(
        jnp.zeros(N), speech_like(key, N, CFG.fs, 200.0)[None], 90.0,
        jnp.asarray([40.0]), CFG.mic_dist, CFG.fs,
    )
    assert weighted_gate(tgt_only["mixture"]) < 0.25
    assert weighted_gate(itf_only["mixture"]) > 0.6

    sc = _scene(jax.random.PRNGKey(1), itf_deg=(40.0, 130.0))
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    S_t = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_i = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    oracle_noise = jnp.abs(S_i) > jnp.abs(S_t)
    gate, _, valid = fov_noise_gate(Y, 90.0, 40.0, CFG.mic_dist, CFG.fs)
    w = jnp.abs(Y[0]) ** 2 * valid
    agree = float(jnp.sum(((gate > 0.5) == oracle_noise) * w) / jnp.sum(w))
    assert agree > 0.85, agree


def test_gate_prevents_self_cancellation():
    """Camera direction off by 6 deg, uninformative mask: plain MPDR
    (target inside R) self-cancels; the protection cone recovers >3 dB of
    SDR without losing SIR."""
    sc = _scene(jax.random.PRNGKey(1), tgt_deg=84.0, itf_deg=(40.0,))
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    d = steering_vector(freqs, 90.0, CFG.mic_dist, CFG.c, CFG.n_mics)
    gate, protect, valid = fov_noise_gate(Y, 90.0, 40.0, CFG.mic_dist, CFG.fs)
    uniform = jnp.full(gate.shape, 0.5, jnp.float32)

    def run(nm):
        S = masked_mvdr(Y, nm, d, freqs, sigma=CFG.sigma)
        out = istft(S, CFG.n_fft, CFG.hop, length=N)
        sdr, sir = sdr_sir(out, sc["target_ref"], sc["interference_ref"])
        return float(sdr), float(sir)

    sdr_plain, sir_plain = run(uniform)
    sdr_gated, sir_gated = run(apply_fov_gate(uniform, gate, protect, valid))
    assert sdr_gated > sdr_plain + 3.0, (sdr_gated, sdr_plain)
    assert sir_gated > sir_plain - 1.0, (sir_gated, sir_plain)
    assert sir_gated > 15.0


def test_gating_through_learned_pipeline():
    """fov_deg plumbs through learned_enhance for both beamformers and
    stays finite; with an untrained net it must not hurt the K=1 scene."""
    from azoom.models.unet import FreqPreservingUNet
    from azoom.pipelines.learned import learned_enhance
    from azoom.train.data import synth_batch
    from azoom.train.loop import create_state

    model = FreqPreservingUNet(base=4)
    batch = synth_batch(jax.random.PRNGKey(0), 1, CFG, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sc = _scene(jax.random.PRNGKey(2), itf_deg=(40.0,))
    for bf in ("mvdr", "hard_null"):
        out = learned_enhance(
            sc["mixture"], model, variables, CFG, beamformer=bf, fov_deg=40.0
        )
        assert out.shape == (N,)
        assert np.isfinite(np.asarray(out)).all()
    out_plain = learned_enhance(sc["mixture"], model, variables, CFG)
    out_gated = learned_enhance(sc["mixture"], model, variables, CFG, fov_deg=40.0)
    _, sir_plain = sdr_sir(out_plain, sc["target_ref"], sc["interference_ref"])
    _, sir_gated = sdr_sir(out_gated, sc["target_ref"], sc["interference_ref"])
    assert float(sir_gated) > float(sir_plain) - 1.0


def test_audiozoom_fov_reaches_learned_path():
    """AudioZoom passes its FOV into the gating; changing the FOV changes
    the output, and the bundled-model blind SIR stays strong with gating
    active (regression guard for the facade default)."""
    from azoom import AudioZoom

    sc = _scene(jax.random.PRNGKey(3), itf_deg=(40.0, 130.0))
    az = AudioZoom(model="fpu", fov_deg=40.0)
    out = az.enhance(np.asarray(sc["mixture"]))
    az_wide = AudioZoom(model="fpu", fov_deg=120.0)
    out_wide = az_wide.enhance(np.asarray(sc["mixture"]))
    assert out.shape == out_wide.shape == (N,)
    assert not np.allclose(out, out_wide)
    _, sir = sdr_sir(jnp.asarray(out), sc["target_ref"], sc["interference_ref"])
    _, sir_in = sdr_sir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(sir) - float(sir_in) > 10.0

"""Tests for WPE dereverb, SRP localization, STOI, and report writers."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.stft import rfft_freqs, stft
from azoom.eval.reports import append_to_csv, compute_run_metrics, format_report
from azoom.eval.stoi import stoi
from azoom.localize.srp import srp_localize, srp_map
from azoom.sim.farfield import make_scene
from azoom.sim.scene import SceneSpec, generate_scene
from azoom.sim.signals import speech_like, speech_like_batch
from azoom.wpe.dereverb import wpe_dereverb

CFG = PipelineConfig(mic_dist=0.04)


# ---------- WPE ----------

def test_wpe_preserves_dry_signal():
    """On anechoic input WPE should be near-identity (nothing to predict)."""
    x = speech_like(jax.random.PRNGKey(0), 16_000, 16_000)
    stereo = jnp.stack([x, x])
    out = wpe_dereverb(stereo, CFG, iterations=2)
    assert out.shape == stereo.shape
    corr = np.corrcoef(np.asarray(out[0]), np.asarray(x))[0, 1]
    assert corr > 0.9


def test_wpe_reduces_reverb_tail():
    """WPE must increase direct-to-reverb correlation on a wet signal."""
    spec = SceneSpec(reverb=True, n_interferers=0, duration_s=1.5, snr_db=80.0)
    key = jax.random.PRNGKey(1)
    dry = speech_like(key, 24_000, 16_000)
    sc = generate_scene(key, spec, source_signals=dry[None], max_order=6)
    wet = sc["mixture"]
    dereverbed = wpe_dereverb(wet, CFG)

    def corr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        a = a - a.mean()
        b = b - b.mean()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    dry_np = np.asarray(dry)
    c_wet = corr(wet[0], dry_np)
    c_dry = corr(dereverbed[0], dry_np)
    assert c_dry >= c_wet - 0.02  # never worse; usually better


# ---------- SRP ----------

def test_srp_finds_single_source():
    sig = speech_like(jax.random.PRNGKey(2), 32_000, CFG.fs)
    for true_angle in (60.0, 90.0, 120.0):
        sc = make_scene(
            sig, jnp.zeros((0, 32_000)), true_angle, jnp.zeros((0,)),
            CFG.mic_dist, CFG.fs,
        )
        Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
        freqs = rfft_freqs(CFG.n_fft, CFG.fs)
        est = float(srp_localize(Y, freqs, CFG.mic_dist))
        assert abs(est - true_angle) < 10.0, f"{true_angle} -> {est}"


def test_srp_map_peaks_at_sources():
    """3-source scene (40/90/130): the SRP map's top angles must cover the
    true bearings (debug_srp.py's visual assertion, automated)."""
    sigs = speech_like_batch(jax.random.PRNGKey(3), 3, 32_000, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]), CFG.mic_dist, CFG.fs
    )
    Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
    freqs = rfft_freqs(CFG.n_fft, CFG.fs)
    angles, power = srp_map(Y, freqs, CFG.mic_dist)
    angles, power = np.asarray(angles), np.asarray(power)
    # local maxima above the median, within 8 deg of some true angle
    for true in (40.0, 90.0, 130.0):
        near = np.abs(angles - true) <= 8.0
        assert power[near].max() > np.median(power)


# ---------- STOI ----------

def test_stoi_clean_is_high():
    x = speech_like(jax.random.PRNGKey(4), 32_000, 16_000)
    s = float(stoi(x, x))
    assert s > 0.95


def test_stoi_decreases_with_noise():
    x = np.asarray(speech_like(jax.random.PRNGKey(5), 32_000, 16_000))
    rng = np.random.default_rng(0)
    scores = []
    for snr_db in (30.0, 5.0, -10.0):
        noise = rng.standard_normal(x.shape).astype(np.float32)
        noise *= np.sqrt(np.mean(x**2) / 10 ** (snr_db / 10) / np.mean(noise**2))
        scores.append(float(stoi(jnp.asarray(x), jnp.asarray(x + noise))))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.85
    assert scores[2] < 0.6


# ---------- Reports ----------

def test_report_and_csv(tmp_path, rng):
    tgt = rng.standard_normal(16_000).astype(np.float32)
    itf = rng.standard_normal(16_000).astype(np.float32)
    mix = tgt + itf
    est = tgt + 0.1 * itf
    m = compute_run_metrics(est, mix, tgt, itf, with_perceptual=True)
    assert m["imp"] > 5.0
    rep = format_report("run_x", m)
    assert "SIR IMPROVEMENT" in rep and "run_x" in rep

    csv_path = tmp_path / "batch_metrics.csv"
    append_to_csv(csv_path, "run_x", m)
    append_to_csv(csv_path, "run_y", m)
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("Run_ID,SIR_Base,SIR_Enh")
    assert len(lines) == 3

    # Header guard: a CSV with the legacy `_native`-suffixed perceptual
    # columns (the pre-round-5 scheme) must be refused, not silently
    # continued under the promoted column names.
    import pytest as _pytest

    other = tmp_path / "other_backend.csv"
    hdr = csv_path.read_text().splitlines()[0]
    swapped = (
        hdr.replace("_native", "") if "_native" in hdr
        else hdr.replace("PESQ_WB", "PESQ_WB_native").replace(
            "PESQ_NB", "PESQ_NB_native")
    )
    other.write_text(swapped + "\n")
    with _pytest.raises(ValueError, match="backend"):
        append_to_csv(other, "run_z", m)


def test_pesq_unavailable_renders_na(tmp_path, rng):
    """When the pesq lib is absent, report + CSV must say N/A, never 0.0
    (round-1 VERDICT: 0.0 is indistinguishable from a catastrophic score)."""
    from azoom.eval.pesq_bridge import pesq_scores

    tgt = rng.standard_normal(16_000).astype(np.float32)
    est = tgt + 0.1 * rng.standard_normal(16_000).astype(np.float32)
    nb, wb = pesq_scores(tgt, est, 16_000)
    m = compute_run_metrics(est, tgt + est, tgt, est - tgt, with_perceptual=True)
    if nb is None:  # environment without the pesq C extension
        assert m["pesq_wb"] is None and m["pesq_nb"] is None
        rep = format_report("r", m)
        assert "N/A (WB)" in rep
        p = tmp_path / "c.csv"
        append_to_csv(p, "r", m)
        assert ",N/A,N/A" in p.read_text()
    else:  # pesq present: real numbers flow through
        assert isinstance(m["pesq_wb"], float)

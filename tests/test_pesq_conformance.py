"""Bounds on the native-PESQ conformance gap (VERDICT round 2, #5).

``azoom.eval.pesq_native`` is a from-scratch P.862 chain that is NOT
ITU-conformance-tested (its module docstring says so). These tests bound
how far it can drift without failing CI, using the three anchors the
standard itself provides:

  1. the published P.862.1 / P.862.2 raw->MOS-LQO mapping constants
     (spot values recomputed here from an independent transcription of
     the ITU formulas);
  2. MNRU behavior: P.862 was calibrated against Modulated Noise
     Reference Unit conditions — MOS must increase monotonically with Q
     and span most of the scale between Q=5 and Q=45;
  3. the reference repo's committed output WAVs
     (/root/reference/data/outputs) — the ordering azoom's estimator
     assigns must match the reference pipeline's qualitative ranking
     (oracle beamformer far above the raw mixture and above the masked /
     heuristic outputs, all of which its own ITU-lib CSV scores near the
     bottom of the scale: Final_pipeline/data/results/batch_metrics.csv
     PESQ_WB 1.03-1.61).
"""

import math
from pathlib import Path

import numpy as np
import pytest

from azoom.eval.pesq_native import mos_lqo_nb, mos_lqo_wb, pesq_native

FS = 16_000
REF_DATA = Path("/root/reference/data")

needs_fixtures = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference fixtures not mounted"
)


# --- 1. P.862.1 / .2 mapping spot values -------------------------------

def _itu_map(raw, a, b):
    # Independent transcription of the published logistic:
    #   y = 0.999 + 4.0 / (1 + exp(a * raw + b))
    return 0.999 + 4.0 / (1.0 + math.exp(a * raw + b))


@pytest.mark.parametrize("raw", [-0.5, 0.0, 1.0, 2.5, 4.0, 4.5])
def test_p862_1_nb_mapping_spot_values(raw):
    # P.862.1 (narrowband): a = -1.4945, b = 4.6607.
    assert mos_lqo_nb(raw) == pytest.approx(
        _itu_map(raw, -1.4945, 4.6607), abs=1e-9
    )


@pytest.mark.parametrize("raw", [-0.5, 0.0, 1.0, 2.5, 4.0, 4.5])
def test_p862_2_wb_mapping_spot_values(raw):
    # P.862.2 (wideband): a = -1.3669, b = 3.8224.
    assert mos_lqo_wb(raw) == pytest.approx(
        _itu_map(raw, -1.3669, 3.8224), abs=1e-9
    )


def test_mapping_ranges():
    # Both mappings are bounded to (0.999, 4.999) and hit the documented
    # extremes of the raw scale sanely.
    for f in (mos_lqo_nb, mos_lqo_wb):
        assert 0.999 < f(-0.5) < 1.3
        assert 4.3 < f(4.5) < 5.0


# --- 2. MNRU Q-sweep ---------------------------------------------------

def _speech(n=4 * FS, seed=0):
    """Speech-shaped test signal: AM-modulated harmonic complexes with
    pauses (same construction as tests/test_pesq_native.py)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / FS
    x = np.zeros(n, np.float32)
    for f0 in (110.0, 150.0, 200.0):
        harm = sum(
            np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 2 * np.pi)) / k
            for k in range(1, 8)
        )
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t), 0, None)
        x += (harm * env).astype(np.float32)
    return 0.1 * x / (np.max(np.abs(x)) + 1e-9)


def _mnru(x, q_db, seed=1):
    """Modulated Noise Reference Unit (ITU-T P.810): y = x * (1 + n/10^(Q/20))
    — speech-correlated multiplicative noise at Q dB."""
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x)).astype(np.float32)
    return x * (1.0 + 10.0 ** (-q_db / 20.0) * n)


def test_mnru_q_sweep_monotonic_wb():
    """MOS-LQO must rise monotonically with MNRU Q and span most of the
    scale — the qualitative behavior every conformant P.862 build shows
    on its calibration conditions."""
    x = _speech()
    scores = [pesq_native(FS, x, _mnru(x, q), "wb") for q in (5, 15, 25, 35, 45)]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores
    assert scores[0] < 2.0, f"Q=5 dB should score near the bottom: {scores}"
    assert scores[-1] > 3.5, f"Q=45 dB should score near the top: {scores}"


def test_mnru_q_sweep_monotonic_nb():
    x = _speech()
    scores = [pesq_native(FS, x, _mnru(x, q), "nb") for q in (5, 25, 45)]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores


# --- 3. Reference committed outputs: qualitative ranking ---------------

def _load(name):
    from azoom.io.wav import read_wav

    audio, fs = read_wav(REF_DATA / name)
    assert fs == FS
    return audio


@needs_fixtures
def test_reference_outputs_ranking():
    """Score the reference repo's own committed enhancement outputs for
    its 1 cm test scene against its target stem. The native estimator
    must reproduce the pipeline's qualitative ranking: the oracle
    beamformer clearly on top; masked/heuristic outputs and the raw
    mixture clustered near the bottom (exactly where the reference's
    ITU-lib CSV puts its enhanced outputs, batch_metrics.csv WB
    1.03-1.61). Measured here: oracle_gev 2.67, mixture 1.27,
    maxsnr_fov 1.26, masked_mvdr 1.12."""
    ref = _load("inputs/test_target_ref.wav")
    mix = _load("inputs/test_mixture.wav")[:, 0]

    def score(deg):
        n = min(len(ref), len(deg))
        return pesq_native(FS, ref[:n], deg[:n], "wb")

    s_mix = score(mix)
    s_oracle = score(_load("outputs/output_oracle_gev.wav"))
    s_masked = score(_load("outputs/output_masked_mvdr.wav"))
    s_fov = score(_load("outputs/output_maxsnr_fov_3.0deg.wav"))

    for s in (s_mix, s_oracle, s_masked, s_fov):
        assert 0.999 <= s <= 4.999
    # Oracle far above everything else.
    assert s_oracle > s_mix + 1.0
    assert s_oracle > s_masked + 1.0
    assert s_oracle > s_fov + 1.0
    # Non-oracle outputs sit at the bottom of the scale, like the
    # reference's own ITU-lib campaign numbers.
    for s in (s_mix, s_masked, s_fov):
        assert s < 2.0


@needs_fixtures
def test_reference_outputs_nb_consistent():
    """NB and WB modes agree on the headline separation."""
    ref = _load("inputs/test_target_ref.wav")
    mix = _load("inputs/test_mixture.wav")[:, 0]
    oracle = _load("outputs/output_oracle_gev.wav")

    def score(deg, mode):
        n = min(len(ref), len(deg))
        return pesq_native(FS, ref[:n], deg[:n], mode)

    assert score(oracle, "nb") > score(mix, "nb") + 0.5

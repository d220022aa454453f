"""Native PESQ (P.862-family) validation.

No ITU conformance vectors exist in this environment (and no ``pesq``
package), so validation targets what the standard fixes exactly plus
behavioral properties:

  * identity -> raw 4.5 -> MOS-LQO 4.549 (NB, P.862.1) / 4.644 (WB,
    P.862.2) — the mappings pin these anchors analytically;
  * monotonic degradation with additive-noise SNR;
  * constant-delay invariance (the time-alignment stage);
  * score floor ~1.0 for destroyed signals;
  * the bridge now always produces numeric PESQ columns.
"""

import numpy as np
import pytest

from azoom.eval.pesq_native import pesq_native, raw_pesq

FS = 16_000


def _speech_like(seconds: float = 3.0, seed: int = 0) -> np.ndarray:
    """Harmonic series with pitch drift and syllabic AM (host-side twin of
    azoom.sim.signals.speech_like, kept numpy so this module has no JAX
    dependency)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(FS * seconds)) / FS
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.5 * t + rng.uniform(0, 6.28))
    ph = 2 * np.pi * np.cumsum(f0) / FS
    sig = sum(np.sin(k * ph) / k for k in range(1, 9))
    env = np.clip(np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6.28)), 0, None) ** 1.5
    x = sig * (env + 0.05)
    return (x / np.max(np.abs(x))).astype(np.float64)


@pytest.fixture(scope="module")
def speech():
    return _speech_like()


def _with_noise(x, snr_db, seed=1):
    n = np.random.default_rng(seed).standard_normal(x.size)
    n *= np.sqrt(np.mean(x**2) / np.mean(n**2)) * 10.0 ** (-snr_db / 20.0)
    return x + n


def test_identity_anchors(speech):
    # P.862.1/.2 mappings evaluated at raw=4.5 — exact by construction.
    assert raw_pesq(speech, speech, FS, "wb") == pytest.approx(4.5)
    assert pesq_native(FS, speech, speech, "wb") == pytest.approx(4.6439, abs=1e-3)
    assert pesq_native(FS, speech, speech, "nb") == pytest.approx(4.5486, abs=1e-3)


def test_monotonic_under_noise(speech):
    for mode in ("wb", "nb"):
        scores = [
            pesq_native(FS, speech, _with_noise(speech, snr), mode)
            for snr in (40, 30, 20, 10)
        ]
        assert all(a > b for a, b in zip(scores, scores[1:])), (mode, scores)
        # 40 dB SNR clearly above the floor. (On REAL speech the ITU-table
        # chain scores 40 dB SNR at ~3.8; this synthetic signal's deep
        # exact-silence pauses make additive noise maximally audible, so
        # its absolute score sits lower — see test_pesq_conformance's
        # real-speech sweeps for the calibrated anchors.)
        assert scores[0] > 1.6, (mode, scores)
        assert scores[-1] < 1.5  # 10 dB white noise is near the floor


def test_delay_invariance(speech):
    delayed = np.concatenate([np.zeros(int(0.032 * FS)), speech])[: speech.size]
    assert pesq_native(FS, speech, delayed, "wb") > 4.3
    # and a degraded-but-delayed signal scores like its undelayed twin
    noisy = _with_noise(speech, 25.0)
    noisy_del = np.concatenate([np.zeros(400), noisy])[: speech.size]
    a = pesq_native(FS, speech, noisy, "wb")
    b = pesq_native(FS, speech, noisy_del, "wb")
    assert abs(a - b) < 0.35, (a, b)


def test_floor_and_bounds(speech):
    z = pesq_native(FS, speech, np.zeros_like(speech), "wb")
    assert 0.99 < z < 1.3
    for deg in (np.zeros_like(speech), _with_noise(speech, 0.0), speech):
        for mode in ("wb", "nb"):
            s = pesq_native(FS, speech, deg, mode)
            assert 0.99 < s < 4.65


def test_narrowband_8k_and_wb_guard(speech):
    x8 = speech[::2]  # naive decimation is fine for a smoke check
    s = pesq_native(8_000, x8, _with_noise(x8, 30.0), "nb")
    assert 1.0 < s < 4.6
    with pytest.raises(ValueError):
        pesq_native(8_000, x8, x8, "wb")


def test_interference_suppression_ordering(speech):
    """An enhanced output (residual interference down 14 dB) must outscore
    the raw mixture — the ordering the reference's campaigns rely on
    (batch_metrics.csv PESQ columns)."""
    interf = _speech_like(seed=7)
    mixture = speech + 0.5 * interf
    enhanced = speech + 0.1 * interf
    assert pesq_native(FS, speech, enhanced, "wb") > pesq_native(
        FS, speech, mixture, "wb"
    )


def test_bridge_always_numeric(speech):
    from azoom.eval.pesq_bridge import PESQ_AVAILABLE, PESQ_BACKEND, pesq_scores

    assert PESQ_AVAILABLE
    assert PESQ_BACKEND in ("itu", "native")
    nb, wb = pesq_scores(speech, _with_noise(speech, 30.0), FS)
    assert isinstance(nb, float) and isinstance(wb, float)
    nb8, wb8 = pesq_scores(speech[::2], speech[::2], 8_000)
    assert isinstance(nb8, float) and wb8 is None


def test_reports_carry_pesq(tmp_path, speech):
    from azoom.eval.reports import append_to_csv, compute_run_metrics, format_report

    interf = _speech_like(seed=3)
    m = compute_run_metrics(
        enhanced=speech + 0.05 * interf,
        mixture_ch0=speech + 0.5 * interf,
        target_ref=speech,
        interference_ref=interf,
        fs=FS,
    )
    assert isinstance(m["pesq_wb"], float) and isinstance(m["pesq_nb"], float)
    rep = format_report("pesq_run", m)
    assert "N/A" not in rep
    append_to_csv(tmp_path / "batch_metrics.csv", "pesq_run", m)
    row = (tmp_path / "batch_metrics.csv").read_text().splitlines()[1]
    assert "N/A" not in row

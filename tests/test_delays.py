"""Steering-vector phases must match the reference TDOA model bit-for-bit
(rt_av_zoom/core/masked_mvdr.py:22-35)."""

import numpy as np
import pytest

from azoom.dsp import far_field_delays, fractional_delay, steering_vector


def reference_steering(angle_deg, f, d, c):
    """Independent numpy re-derivation of the reference 2-mic phase model."""
    theta = np.deg2rad(angle_deg)
    tau1 = (d / 2) * np.cos(theta) / c
    tau2 = (d / 2) * np.cos(theta - np.pi) / c
    omega = 2 * np.pi * f
    return np.array([np.exp(-1j * omega * tau1), np.exp(-1j * omega * tau2)])


@pytest.mark.parametrize("angle", [0.0, 40.0, 90.0, 130.0, 180.0])
def test_steering_matches_reference_model(angle):
    d, c = 0.08, 343.0
    freqs = np.fft.rfftfreq(1024, 1 / 16000).astype(np.float32)
    ours = np.asarray(steering_vector(freqs, angle, d, c))  # (F, 2)
    for fi in [1, 64, 200, 512]:
        ref = reference_steering(angle, freqs[fi], d, c)
        np.testing.assert_allclose(ours[fi], ref, atol=1e-5)


def test_broadside_is_unit():
    freqs = np.fft.rfftfreq(1024, 1 / 16000).astype(np.float32)
    d = np.asarray(steering_vector(freqs, 90.0, 0.08))
    np.testing.assert_allclose(d, np.ones_like(d), atol=1e-6)


def test_far_field_delays_antisymmetric():
    tau = np.asarray(far_field_delays(40.0, 0.08))
    assert tau.shape == (2,)
    np.testing.assert_allclose(tau[0], -tau[1], atol=1e-12)
    np.testing.assert_allclose(tau[0], (0.04) * np.cos(np.deg2rad(40.0)) / 343.0, rtol=1e-6)


def test_fractional_delay_integer_shift(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    fs = 16000
    shifted = np.asarray(fractional_delay(x, 3.0 / fs, fs))
    # circular shift by 3 samples
    np.testing.assert_allclose(shifted, np.roll(x, 3), atol=1e-4)


def test_fractional_delay_matches_reference_formula(rng):
    """Same rfft phase-ramp as world_building.py:46-52."""
    x = rng.standard_normal(5000).astype(np.float32)
    fs, delay = 16000, 1.234e-4
    n = len(x)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    ref = np.fft.irfft(np.fft.rfft(x) * np.exp(-1j * 2 * np.pi * freqs * delay), n=n)
    ours = np.asarray(fractional_delay(x, delay, fs))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

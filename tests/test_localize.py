"""Localization tests: GCC-PHAT single-source accuracy, IPD-histogram
multi-source resolution, FOV restriction."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.stft import stft
from azoom.localize.srp import (
    gcc_phat_localize,
    ipd_angle_histogram,
    ipd_histogram_localize,
)
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like, speech_like_batch

CFG = PipelineConfig(mic_dist=0.04)


def _stft_of_scene(target_angle, interferer_angles, key=21, n=32_000):
    k = len(interferer_angles)
    sigs = speech_like_batch(jax.random.PRNGKey(key), k + 1, n, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1 : k + 1], target_angle,
        jnp.asarray(interferer_angles), CFG.mic_dist, CFG.fs,
    )
    return stft(sc["mixture"], CFG.n_fft, CFG.hop)


def test_gcc_phat_single_source_exact():
    sig = speech_like(jax.random.PRNGKey(2), 32_000, CFG.fs)
    for ang in (60.0, 90.0, 120.0):
        sc = make_scene(
            sig, jnp.zeros((0, 32_000)), ang, jnp.zeros((0,)),
            CFG.mic_dist, CFG.fs,
        )
        Y = stft(sc["mixture"], CFG.n_fft, CFG.hop)
        est = float(gcc_phat_localize(Y, CFG.mic_dist, CFG.fs))
        assert abs(est - ang) < 3.0


def test_ipd_histogram_resolves_two_talkers():
    Y = _stft_of_scene(60.0, [130.0])
    est_t = float(ipd_histogram_localize(Y, CFG.mic_dist, CFG.fs, 70.0, 60.0))
    est_i = float(ipd_histogram_localize(Y, CFG.mic_dist, CFG.fs, 130.0, 40.0))
    assert abs(est_t - 60.0) < 6.0
    assert abs(est_i - 130.0) < 6.0


def test_ipd_histogram_three_sources():
    Y = _stft_of_scene(90.0, [40.0, 130.0], key=3)
    for center, width, true in ((90.0, 40.0, 90.0), (40.0, 30.0, 40.0),
                                (130.0, 30.0, 130.0)):
        est = float(
            ipd_histogram_localize(Y, CFG.mic_dist, CFG.fs, center, width)
        )
        assert abs(est - true) < 6.0, f"fov {center}: {est} vs {true}"


def test_histogram_is_multimodal():
    Y = _stft_of_scene(60.0, [130.0])
    angles, hist = ipd_angle_histogram(Y, CFG.mic_dist, CFG.fs)
    angles, hist = np.asarray(angles), np.asarray(hist)
    near60 = hist[np.abs(angles - 60) <= 8].max()
    near130 = hist[np.abs(angles - 130) <= 8].max()
    trough = hist[(angles > 85) & (angles < 105)].min()
    assert near60 > trough and near130 > trough

"""Inference-time geometry adaptation (round-3 flagship fix).

The IPD at spacing d is -2 pi f d cos(theta) / c — linear in d — so a net
trained at d_train serves a smaller array exactly by rescaling measured
IPD by d_train / d_actual (azoom.masks.features). These tests pin the
physics (scaled small-array cues == native large-array cues), the no-op
guarantee at the native spacing, the auto-engage rule, and the measured
end-to-end win.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azoom.config import PipelineConfig
from azoom.dsp.stft import stft
from azoom.masks.features import logmag_ipd_features, physics_aware_features
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch


def _scene(d, key=3):
    cfg = PipelineConfig(mic_dist=d)
    sigs = speech_like_batch(jax.random.PRNGKey(key), 2, 16_000, cfg.fs)
    return make_scene(sigs[0], sigs[1:2], 60.0, jnp.asarray([120.0]), d, cfg.fs), cfg


def test_scale_one_is_noop():
    sc, cfg = _scene(0.04)
    Y = stft(sc["mixture"], cfg.n_fft, cfg.hop)
    a = physics_aware_features(Y)
    b = physics_aware_features(Y, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = logmag_ipd_features(Y)
    d = logmag_ipd_features(Y, 1.0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_scaled_small_array_matches_native_large_array():
    """Noiseless far field: features of a 1 cm array scaled x4 must equal
    the features of the same scene captured by a 4 cm array, below the
    4 cm aliasing limit."""
    sc1, cfg = _scene(0.01)
    sc4, _ = _scene(0.04)
    Y1 = stft(sc1["mixture"], cfg.n_fft, cfg.hop)
    Y4 = stft(sc4["mixture"], cfg.n_fft, cfg.hop)
    f1 = np.asarray(physics_aware_features(Y1, ipd_scale=4.0))
    f4 = np.asarray(physics_aware_features(Y4))
    # Compare sin/cos IPD channels where the energy is meaningful and the
    # 4 cm cue is unaliased (< c / (2*0.04) = 4.3 kHz -> bins < 275).
    # Scene scaling (peak norm) differs per spacing; restrict to
    # high-energy bins of BOTH captures.
    mag1, mag4 = f1[..., 0], f4[..., 0]
    strong = (mag1 > np.percentile(mag1, 85)) & (mag4 > np.percentile(mag4, 85))
    strong[275:, :] = False
    for ch in (1, 2):
        err = np.abs(f1[..., ch][strong] - f4[..., ch][strong])
        assert np.median(err) < 0.05, (ch, np.median(err))


def test_scaled_logmag_ipd_matches_native_large_array():
    """The 2-ch feature's scaled IPD must equal the principal-value IPD
    the training-spacing array would measure (the raw angle difference
    carries +-2pi phase-straddle jitter that a x4 scale would amplify —
    the scaled path must not inherit it)."""
    sc1, cfg = _scene(0.01)
    sc4, _ = _scene(0.04)
    Y1 = stft(sc1["mixture"], cfg.n_fft, cfg.hop)
    Y4 = stft(sc4["mixture"], cfg.n_fft, cfg.hop)
    f1 = np.asarray(logmag_ipd_features(Y1, ipd_scale=4.0))
    f4 = np.asarray(logmag_ipd_features(Y4))
    # Native features use the raw angle difference; wrap them to the
    # principal value for a like-for-like comparison.
    ipd4 = np.mod(f4[..., 1] + np.pi, 2 * np.pi) - np.pi
    mag1, mag4 = f1[..., 0], f4[..., 0]
    strong = (mag1 > np.percentile(mag1, 85)) & (mag4 > np.percentile(mag4, 85))
    strong[275:, :] = False  # below the 4 cm aliasing limit (~4.3 kHz)
    # circular distance (values straddling the wrap boundary differ by 2pi)
    diff = np.abs(f1[..., 1][strong] - ipd4[strong])
    err = np.minimum(diff, 2 * np.pi - diff)
    assert np.median(err) < 0.05, np.median(err)
    # and the scaled cue stays in principal range
    assert float(np.abs(f1[..., 1]).max()) <= np.pi + 1e-6


def test_geo_adapt_rule():
    from azoom.models.pretrained import geo_adapt_dist

    assert geo_adapt_dist("tpufpu", 0.01) == 0.04  # smaller: adapt
    assert geo_adapt_dist("tpufpu", 0.04) is None  # native: no-op
    assert geo_adapt_dist("tpufpu", 0.08) is None  # larger: serve raw
    assert geo_adapt_dist("fpu_multigeo", 0.01) is None  # spacing-trained


def test_geo_adaptation_recovers_small_array_sir():
    """tpufpu at 1 cm: geo-adapted must beat raw by a wide margin
    (measured +11.1 -> +27.7 dB over 16 scenes; 4-scene smoke here)."""
    from azoom.models.pretrained import load_bundled
    from azoom.parallel.sweep import learned_sweep, sweep_summary

    net, variables, feats = load_bundled("tpufpu")
    cfg = PipelineConfig(mic_dist=0.01)
    means = {}
    for tmd in (None, 0.04):
        res = learned_sweep(
            jax.random.PRNGKey(42), cfg, net, variables,
            n_scenes=4, n_samples=32_000, with_stoi=False,
            n_interferers=2, reverb=False, randomize=True,
            feature_kind=feats, train_mic_dist=tmd,
        )
        means[tmd] = sweep_summary(res)["sir_imp"]["mean"]
    assert means[0.04] > means[None] + 5.0, means


def test_facade_auto_adapts_small_arrays():
    from azoom.zoom_api import AudioZoom

    z = AudioZoom(cfg=PipelineConfig(mic_dist=0.01), model="tpufpu")
    assert z._train_mic_dist == 0.04
    z4 = AudioZoom(cfg=PipelineConfig(mic_dist=0.04), model="tpufpu")
    assert z4._train_mic_dist is None
    zm = AudioZoom(cfg=PipelineConfig(mic_dist=0.01), model="fpu_multigeo")
    assert zm._train_mic_dist is None


def test_room_with_mic_dist():
    from azoom.config import ROOM_DEFAULT

    r = ROOM_DEFAULT.with_mic_dist(0.01)
    (x0, y0, z0), (x1, y1, z1) = r.mic_locs
    assert abs((x1 - x0) - 0.01) < 1e-9
    assert y0 == y1 and z0 == z1
    # Same center as the default pair.
    assert abs((x0 + x1) / 2 - 2.45) < 1e-9


def test_physics_features_pair_average_m4():
    """At M>2 the physics features average the cross-spectrum over all
    adjacent pairs; at M=2 they are bit-identical to the single-pair
    formula, and under per-mic phase noise the averaged IPD estimate is
    strictly closer to the true plane-wave IPD."""
    import jax

    from azoom.masks.features import physics_aware_features

    key = jax.random.PRNGKey(0)
    F, T = 129, 24
    true_ipd = jnp.linspace(-2.5, 2.5, F)[:, None] * jnp.ones((F, T))
    mag = jnp.ones((F, T))

    def mic(m, noise):
        phase = -m * true_ipd + noise[m]
        return mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

    noise = 0.6 * jax.random.normal(key, (4, F, T))
    Y4 = jnp.stack([mic(m, noise) for m in range(4)])
    Y2 = Y4[:2]

    # M=2: identical to the direct single-pair formula.
    f2 = physics_aware_features(Y2)
    cross = Y2[0] * jnp.conj(Y2[1])
    np.testing.assert_array_equal(
        np.asarray(f2[..., 1]),
        np.asarray(cross.imag / (jnp.abs(cross) + 1e-12)),
    )

    # M=4: averaged estimate beats the first pair against the truth.
    f4 = physics_aware_features(Y4)
    err4 = np.mean(
        (np.asarray(f4[..., 1]) - np.asarray(jnp.sin(true_ipd))) ** 2
    )
    err2 = np.mean(
        (np.asarray(f2[..., 1]) - np.asarray(jnp.sin(true_ipd))) ** 2
    )
    assert err4 < 0.6 * err2, (err4, err2)
    assert f4.shape == (F, T, 4)
    assert np.all(np.isfinite(np.asarray(f4)))


def test_logmag_ipd_features_m_general():
    """2-ch feature stack at M>2: principal-value averaged IPD, finite,
    in [-pi, pi); the M=2 unit-scale path keeps the raw-difference
    training convention bit-for-bit."""
    import jax

    from azoom.masks.features import logmag_ipd_features

    k = jax.random.split(jax.random.PRNGKey(1), 2)
    Y4 = (jax.random.normal(k[0], (4, 65, 12))
          + 1j * jax.random.normal(k[1], (4, 65, 12))).astype(jnp.complex64)
    f4 = logmag_ipd_features(Y4)
    assert f4.shape == (65, 12, 2)
    ipd4 = np.asarray(f4[..., 1])
    assert np.all(np.isfinite(ipd4))
    assert ipd4.min() >= -np.pi - 1e-6 and ipd4.max() <= np.pi + 1e-6

    Y2 = Y4[:2]
    f2 = logmag_ipd_features(Y2)
    raw = np.asarray(jnp.angle(Y2[0]) - jnp.angle(Y2[1]))
    np.testing.assert_array_equal(np.asarray(f2[..., 1]), raw)

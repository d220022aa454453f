"""FAST-tier tracking smoke (trellis-level, no audio synthesis): keeps
DOA-tracker coverage in the default test profile after the round-4
tiering moved the audio-level suite (test_tracking.py) to the slow tier."""

import jax.numpy as jnp
import numpy as np

from azoom.localize.tracking import (
    causal_track,
    momentum_track,
    track_two_sources,
    viterbi_track,
)


def _glide_hists(true_path, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    angles = np.linspace(0.0, 180.0, 181, dtype=np.float32)
    hists = np.stack([
        np.exp(-0.5 * ((angles - th) / 5.0) ** 2)
        + noise * rng.random(181).astype(np.float32)
        for th in true_path
    ])
    return jnp.asarray(angles), jnp.asarray(hists)


def test_viterbi_and_causal_follow_a_glide():
    true = np.linspace(70.0, 110.0, 10)
    angles, hists = _glide_hists(true)
    for fn in (viterbi_track, causal_track):
        path = np.asarray(fn(angles, hists, trans_sigma_deg=8.0))
        assert np.max(np.abs(path - true)) < 7.0, (fn.__name__, path)


def test_backtrack_returns_every_chunk_exactly():
    """Regression for the ADVICE-r4 off-by-one: on a clean ridge the MAP
    backtrack must return chunk 0's state and not duplicate the last one
    (the bug tracked 30->80 as [40, 50, 60, 70, 80, 80])."""
    true = np.array([30.0, 40.0, 50.0, 60.0, 70.0, 80.0])
    angles, hists = _glide_hists(true, noise=0.0)
    # trans_sigma large enough that the MAP path has no endpoint pull-in
    # (at tighter sigmas trading 1 deg of a flat ridge top for transition
    # gain is genuinely optimal; the bug this guards against is a whole
    # CHUNK shift, not a 1-deg endpoint trade).
    path = np.asarray(viterbi_track(angles, hists, trans_sigma_deg=30.0))
    np.testing.assert_allclose(path, true, atol=1e-5)
    m = np.asarray(momentum_track(
        angles, hists, trans_sigma_deg=4.0, rate_deg_per_chunk=10.0,
        switch_penalty=6.0,
    ))
    np.testing.assert_allclose(m, true, atol=1e-5)


def test_momentum_smoke_crossing():
    """Minimal crossing: the momentum tracker stays on the quieter
    ascending glide; both two-source paths resolve."""
    angles = np.linspace(0.0, 180.0, 181, dtype=np.float32)
    C = 11
    tgt = np.linspace(70.0, 110.0, C)
    oth = np.linspace(110.0, 70.0, C)
    hists = np.stack([
        np.exp(-0.5 * ((angles - t) / 4.0) ** 2)
        + 1.3 * np.exp(-0.5 * ((angles - o) / 4.0) ** 2)
        for t, o in zip(tgt, oth)
    ]).astype(np.float32)
    angles, hists = jnp.asarray(angles), jnp.asarray(hists)
    m = np.asarray(momentum_track(
        angles, hists, rate_deg_per_chunk=4.0,
        fov_center_deg=70.0, fov_width_deg=160.0, init_prior_sigma_deg=8.0,
    ))
    assert np.max(np.abs(m - tgt)) < 8.0, m
    t2, o2 = track_two_sources(
        angles, hists, rate_deg_per_chunk=4.0,
        fov_center_deg=70.0, fov_width_deg=160.0, init_prior_sigma_deg=8.0,
    )
    assert abs(float(np.asarray(t2)[-1]) - tgt[-1]) < 8.0
    assert abs(float(np.asarray(o2)[-1]) - oth[-1]) < 8.0

"""Moving-talker tracked zoom: moving-scene synthesis, DOA trackers, and
the tracked autosteer pipeline (the capability the reference's static
world builders never exercise)."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.localize.tracking import ema_track, viterbi_track
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.pipelines.tracked import tracked_autosteer_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.motion import (
    linear_trajectory,
    make_moving_scene,
    mix_far_field_moving,
    traj_block_count,
)
from azoom.sim.signals import speech_like_batch

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

CFG = PipelineConfig(mic_dist=0.08)


# ---------------------------------------------------------------- motion sim


def test_constant_trajectory_matches_static_mixer():
    """A constant trajectory must reproduce the static far-field mixer (the
    block crossfade of identical delays is exact up to the negligible
    circular-delay edge effect)."""
    n = 16_000
    sigs = speech_like_batch(jax.random.PRNGKey(0), 2, n, CFG.fs)
    B = traj_block_count(n, 2048)
    traj = jnp.stack([jnp.full((B,), 60.0), jnp.full((B,), 130.0)])
    moving = mix_far_field_moving(sigs, traj, CFG.mic_dist, CFG.fs)

    from azoom.sim.farfield import mix_far_field

    static = mix_far_field(sigs, jnp.asarray([60.0, 130.0]), CFG.mic_dist, CFG.fs)
    rel = float(
        jnp.linalg.norm(moving - static) / (jnp.linalg.norm(static) + 1e-12)
    )
    assert rel < 5e-3, rel


def test_moving_scene_stems_are_consistent():
    """mixture channel 0 must equal target_ref + interference_ref (the
    answer-key decomposition holds for moving sources too)."""
    n = 16_000
    sigs = speech_like_batch(jax.random.PRNGKey(1), 3, n, CFG.fs)
    B = traj_block_count(n, 2048)
    sc = make_moving_scene(
        sigs[0], sigs[1:], linear_trajectory(60.0, 120.0, B),
        jnp.asarray([30.0, 150.0]), CFG.mic_dist, CFG.fs,
    )
    resid = sc["mixture"][0] - sc["target_ref"] - sc["interference_ref"]
    rel = float(
        jnp.linalg.norm(resid) / (jnp.linalg.norm(sc["mixture"][0]) + 1e-12)
    )
    assert rel < 1e-5, rel
    assert bool(jnp.all(jnp.isfinite(sc["mixture"])))


# ------------------------------------------------------------------ trackers


def _synthetic_trellis(true_path, distract_at=None, seed=0):
    """(angles, hists): Gaussian bump at the true angle per chunk, plus an
    equally-strong distractor mode and noise."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(0.0, 180.0, 181, dtype=np.float32)
    C = len(true_path)
    hists = np.zeros((C, 181), dtype=np.float32)
    for c, th in enumerate(true_path):
        hists[c] += np.exp(-0.5 * ((angles - th) / 6.0) ** 2)
        if distract_at is not None:
            # Distractor out-votes the target on every third chunk (an
            # interferer talking over the target in bursts) but is weak
            # elsewhere — the argmax mode-hops, the MAP path must not.
            gain = 1.5 if c % 3 == 1 else 0.25
            hists[c] += gain * np.exp(
                -0.5 * ((angles - distract_at) / 6.0) ** 2
            )
        hists[c] += 0.02 * rng.random(181).astype(np.float32)
    return jnp.asarray(angles), jnp.asarray(hists)


def test_viterbi_rejects_distractor_mode():
    true = np.linspace(60.0, 110.0, 12)
    angles, hists = _synthetic_trellis(true, distract_at=160.0)
    raw = np.asarray(angles)[np.argmax(np.asarray(hists), axis=-1)]
    assert np.max(np.abs(raw - true)) > 30.0  # argmax mode-hops
    path = np.asarray(viterbi_track(angles, hists, trans_sigma_deg=8.0))
    assert np.max(np.abs(path - true)) < 6.0, path


def _crossing_trellis(amp_other=1.4, C=13):
    """Two glides whose bearings CROSS at 90 deg: target 60 -> 120, a
    LOUDER distractor 120 -> 60. Returns (angles, hists, tgt, oth)."""
    angles = np.linspace(0.0, 180.0, 181)
    tgt = np.linspace(60.0, 120.0, C)
    oth = np.linspace(120.0, 60.0, C)
    hists = np.zeros((C, 181), np.float32)
    for c in range(C):
        hists[c] += np.exp(-0.5 * ((angles - tgt[c]) / 4.0) ** 2)
        hists[c] += amp_other * np.exp(-0.5 * ((angles - oth[c]) / 4.0) ** 2)
    return jnp.asarray(angles), jnp.asarray(hists), tgt, oth


def test_position_only_tracker_swaps_identity_at_crossing():
    """The measured limitation (round-4 VERDICT item 6): with a
    position-only motion model, the sail-through and identity-swap paths
    cost the same, so a louder crossing distractor captures the track."""
    from azoom.localize.tracking import momentum_track

    angles, hists, tgt, oth = _crossing_trellis()
    v = np.asarray(viterbi_track(angles, hists, trans_sigma_deg=8.0,
                                 fov_center_deg=60.0, fov_width_deg=180.0))
    # position-only MAP follows the louder glide after the crossing
    assert np.abs(v[-1] - tgt[-1]) > 30.0, v
    # momentum (direction-state) tracking sails through it
    m = np.asarray(momentum_track(
        angles, hists, rate_deg_per_chunk=5.0,
        fov_center_deg=60.0, fov_width_deg=180.0,
        init_prior_sigma_deg=10.0,
    ))
    assert np.max(np.abs(m - tgt)) < 8.0, m


def test_momentum_track_causal_follows_crossing():
    """The streaming variant (forward filtering on the direction-state
    trellis) also keeps identity through the crossing."""
    from azoom.localize.tracking import momentum_track

    angles, hists, tgt, _ = _crossing_trellis()
    mc = np.asarray(momentum_track(
        angles, hists, rate_deg_per_chunk=5.0, causal=True,
        fov_center_deg=60.0, fov_width_deg=180.0,
        init_prior_sigma_deg=10.0,
    ))
    assert np.max(np.abs(mc - tgt)) < 8.0, mc


def test_track_two_sources_resolves_both_crossing_paths():
    from azoom.localize.tracking import track_two_sources

    angles, hists, tgt, oth = _crossing_trellis()
    t2, o2 = track_two_sources(
        angles, hists, rate_deg_per_chunk=5.0,
        fov_center_deg=60.0, fov_width_deg=180.0,
        init_prior_sigma_deg=10.0,
    )
    assert np.max(np.abs(np.asarray(t2) - tgt)) < 8.0
    # the second track follows the other glide (looser: the exclusion
    # corridor distorts it near the crossing)
    assert np.abs(np.asarray(o2)[-1] - oth[-1]) < 8.0
    assert np.abs(np.asarray(o2)[0] - oth[0]) < 8.0


def test_momentum_matches_viterbi_on_noncrossing_glide():
    """No regression where position-only tracking already works: a single
    glide against a static distractor."""
    from azoom.localize.tracking import momentum_track

    true = np.linspace(60.0, 110.0, 12)
    angles, hists = _synthetic_trellis(true, distract_at=160.0)
    m = np.asarray(momentum_track(angles, hists, rate_deg_per_chunk=5.0))
    assert np.max(np.abs(m - true)) < 8.0, m


def test_tracked_pipeline_momentum_tracker_runs():
    """tracker='momentum'/'momentum_causal' wire through the tracked
    zoom pipeline end to end (heuristic mask path, short scene)."""
    sigs = speech_like_batch(jax.random.PRNGKey(5), 2, 96_000, CFG.fs)
    B = traj_block_count(96_000, 2048)
    sc = make_moving_scene(
        sigs[0], sigs[1:2], linear_trajectory(70.0, 110.0, B),
        linear_trajectory(110.0, 70.0, B)[None, :],  # crossing interferer
        CFG.mic_dist, CFG.fs,
    )
    for tracker in ("momentum", "momentum_causal"):
        out, theta = tracked_autosteer_enhance(
            sc["mixture"], CFG, 70.0, 120.0, tracker=tracker,
            trans_sigma_deg=8.0,
        )
        assert out.shape == (96_000,)
        assert np.all(np.isfinite(np.asarray(out)))
        # ends near the target's final bearing, not the crossing
        # interferer's
        assert abs(float(theta[-1]) - 110.0) < 25.0, np.asarray(theta)


def test_zoom_api_streaming_momentum_tracker_survives_crossing():
    """AudioZoom(track=True, tracker='momentum'): the LIVE push() filter
    carries identity through a bearing crossing with a louder moving
    interferer; the position-only streaming filter swaps (round-4
    crossing study, facade-level)."""
    from azoom import AudioZoom

    cfg = PipelineConfig(mic_dist=0.04)
    n = 192_000
    sigs = speech_like_batch(jax.random.PRNGKey(7), 2, n, cfg.fs)
    sigs = sigs.at[1].multiply(1.3)
    B = traj_block_count(n, 2048)
    sc = make_moving_scene(
        sigs[0], sigs[1:2], linear_trajectory(60.0, 120.0, B),
        linear_trajectory(120.0, 60.0, B)[None, :], cfg.mic_dist, cfg.fs,
    )
    mix = np.asarray(sc["mixture"])

    def final_theta(tracker):
        z = AudioZoom(cfg=cfg, direction_deg=60.0, fov_deg=120.0,
                      track=True, tracker=tracker)
        for i in range(12):
            z.push(mix[:, i * 16_000 : (i + 1) * 16_000])
        return z._track_theta

    th_m = final_theta("momentum")
    assert th_m is not None and abs(th_m - 120.0) < 15.0, th_m


def test_causal_track_filters_and_recovers_from_wrong_first_peak():
    """Forward-Viterbi filtering: follows the glide causally, and — unlike
    the EMA point filter — recovers when the FIRST chunk's peak is a
    spurious distractor (an interferer out-talking the target at stream
    start locked the EMA permanently: its rate gate then excludes the true
    talker for good)."""
    from azoom.localize.tracking import causal_track

    true = np.linspace(60.0, 110.0, 12)
    angles, hists = _synthetic_trellis(true, distract_at=160.0)
    path = np.asarray(causal_track(angles, hists, trans_sigma_deg=8.0))
    assert np.max(np.abs(path - true)) < 8.0, path

    # Wrong first peak: chunk 0's strongest mode sits at 160 deg.
    h = np.asarray(hists).copy()
    h[0] += 3.0 * np.exp(-0.5 * ((np.asarray(angles) - 160.0) / 6.0) ** 2)
    pc = np.asarray(causal_track(angles, jnp.asarray(h), trans_sigma_deg=8.0))
    pe = np.asarray(ema_track(angles, jnp.asarray(h), rate_deg_per_chunk=15.0))
    assert abs(pc[0] - 160.0) < 8.0  # causal: the filter CAN only see chunk 0
    assert np.max(np.abs(pc[4:] - true[4:])) < 8.0, pc  # ...then recovers
    assert np.max(np.abs(pe[4:] - true[4:])) > 30.0, pe  # EMA never does


def test_causal_track_fixed_lag_and_aiming_prior():
    """The two robustness knobs: a small fixed lag corrects the early
    chunks a pure filter gets wrong (it may backtrack through the first
    clean chunks), and the aiming prior prevents the wrong chunk-0 lock
    outright — each independently fixes the wrong-first-peak scene."""
    from azoom.localize.tracking import causal_track

    true = np.linspace(60.0, 110.0, 12)
    angles, hists = _synthetic_trellis(true, distract_at=160.0)
    h = np.asarray(hists).copy()
    h[0] += 3.0 * np.exp(-0.5 * ((np.asarray(angles) - 160.0) / 6.0) ** 2)
    h = jnp.asarray(h)

    # Plain filtering needs ~4 chunks to out-accumulate the strong wrong
    # peak; a lag that covers the capture window corrects every chunk
    # (chunk 0 is decided from the chunk-4 trellis, which has recovered),
    # while lag=2 already corrects everything the chunk-2 horizon can see.
    p4 = np.asarray(causal_track(angles, h, trans_sigma_deg=8.0, lag=4))
    assert np.max(np.abs(p4 - true)) < 10.0, p4
    p2 = np.asarray(causal_track(angles, h, trans_sigma_deg=8.0, lag=2))
    assert np.max(np.abs(p2[1:] - true[1:])) < 10.0, p2

    # Aiming prior at the camera axis (90 deg, sigma 20): kills the
    # 160 deg distractor at 3.5 sigma while the 60 deg target survives.
    pp = np.asarray(causal_track(
        angles, h, trans_sigma_deg=8.0,
        fov_center_deg=90.0, init_prior_sigma_deg=20.0,
    ))
    assert abs(pp[0] - true[0]) < 10.0, pp
    assert np.max(np.abs(pp - true)) < 10.0, pp


def test_causal_track_lag_respects_its_horizon():
    """Fixed-lag causality contract: chunk c's estimate must not change
    when evidence later than c + lag changes."""
    from azoom.localize.tracking import causal_track

    true = np.linspace(60.0, 110.0, 12)
    angles, hists = _synthetic_trellis(true, seed=5)
    lag = 2
    base = np.asarray(causal_track(angles, hists, trans_sigma_deg=8.0, lag=lag))
    h2 = np.asarray(hists).copy()
    h2[8:] = 0.02  # wipe the future: uniform noise after chunk 7
    pert = np.asarray(
        causal_track(angles, jnp.asarray(h2), trans_sigma_deg=8.0, lag=lag)
    )
    np.testing.assert_array_equal(base[: 8 - lag], pert[: 8 - lag])


def test_ema_track_is_causal_and_smooth():
    true = np.linspace(50.0, 100.0, 16)
    angles, hists = _synthetic_trellis(true, distract_at=165.0, seed=3)
    path = np.asarray(
        ema_track(angles, hists, rate_deg_per_chunk=15.0, alpha=0.7)
    )
    assert np.max(np.abs(path - true)) < 10.0, path
    # Rate-limited: no chunk-to-chunk jump beyond the gate.
    assert np.max(np.abs(np.diff(path))) < 16.0


def test_fov_trajectory_gates_per_chunk():
    """A panning camera: per-chunk FOV centers keep the track inside the
    moving window even when a fixed window would admit the distractor."""
    true = np.linspace(40.0, 120.0, 10)
    # A PERSISTENT distractor as strong as the target: without a prior,
    # camping on the constant mode is genuinely the MAP path (no
    # transition cost), so only the camera gate can disambiguate.
    rng = np.random.default_rng(5)
    angles = np.linspace(0.0, 180.0, 181, dtype=np.float32)
    hists = np.stack(
        [
            np.exp(-0.5 * ((angles - th) / 6.0) ** 2)
            + 1.2 * np.exp(-0.5 * ((angles - 160.0) / 6.0) ** 2)
            + 0.02 * rng.random(181).astype(np.float32)
            for th in true
        ]
    )
    angles, hists = jnp.asarray(angles), jnp.asarray(hists)
    static = np.asarray(viterbi_track(angles, hists, trans_sigma_deg=15.0))
    assert np.max(np.abs(static - true)) > 20.0, static  # captured
    # The panning 30-deg window centered on the true path excludes the
    # distractor: the track must stay inside the moving window everywhere.
    path = np.asarray(
        viterbi_track(
            angles, hists, trans_sigma_deg=15.0,
            fov_center_deg=jnp.asarray(true), fov_width_deg=30.0,
        )
    )
    assert np.max(np.abs(path - true)) <= 16.0, path


# ------------------------------------------------------------ full pipeline


def _moving_scene(n=96_000, seed=7):
    sigs = speech_like_batch(jax.random.PRNGKey(seed), 3, n, CFG.fs)
    B = traj_block_count(n, 2048)
    return make_moving_scene(
        sigs[0], sigs[1:], linear_trajectory(55.0, 125.0, B),
        jnp.asarray([25.0, 155.0]), CFG.mic_dist, CFG.fs,
    )


def test_tracked_beats_static_autosteer_on_moving_talker():
    sc = _moving_scene()
    out_t, theta = tracked_autosteer_enhance(
        sc["mixture"], CFG, fov_center_deg=90.0, fov_width_deg=100.0,
    )
    out_s, theta_s = autosteer_enhance(
        sc["mixture"], CFG, fov_center_deg=90.0, fov_width_deg=100.0,
    )
    _, sir_t = osinr_osir(out_t, sc["target_ref"], sc["interference_ref"])
    _, sir_s = osinr_osir(out_s, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(
        sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    # The track follows the 55 -> 125 glide.
    th = np.asarray(theta)
    assert th[0] < 80.0 and th[-1] > 100.0, th
    assert float(sir_t) > float(sir_in) + 3.0  # enhancement is real
    assert float(sir_t) > float(sir_s) + 2.0  # tracking beats one bearing


def test_tracked_zoom_m4_array_and_config_reconcile():
    """Tracked zoom composes with the M-mic generalization: a 4-mic moving
    scene runs through the same pipeline (pair-averaged DOA histogram +
    M-general MVDR) and beats the 2-mic array, even when the caller's cfg
    still says n_mics=2 — the pipeline entries reconcile the static mic
    count from the input shape (PipelineConfig.for_input)."""
    n, seed = 96_000, 7
    sigs = speech_like_batch(jax.random.PRNGKey(seed), 3, n, CFG.fs)
    B = traj_block_count(n, 2048)
    sirs = {}
    for m in (2, 4):
        sc = make_moving_scene(
            sigs[0], sigs[1:], linear_trajectory(55.0, 125.0, B),
            jnp.asarray([25.0, 155.0]), CFG.mic_dist, CFG.fs, n_mics=m,
        )
        assert sc["mixture"].shape[0] == m
        # cfg deliberately left at the default n_mics=2 for both runs.
        out, theta = tracked_autosteer_enhance(
            sc["mixture"], CFG, fov_center_deg=90.0, fov_width_deg=100.0,
            tracker="causal",
        )
        assert bool(jnp.all(jnp.isfinite(out)))
        th = np.asarray(theta)
        assert th[0] < 80.0 and th[-1] > 100.0, (m, th)
        _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
        _, sir_in = osinr_osir(
            sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
        )
        sirs[m] = float(sir - sir_in)
    # Two extra mics must buy real dB on the 2-interferer moving scene.
    assert sirs[4] > sirs[2] + 1.0, sirs


def test_pipeline_config_for_input():
    from azoom.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.for_input(jnp.zeros((2, 100))) is cfg  # match: no copy
    assert cfg.for_input(jnp.zeros((100,))) is cfg  # mono: untouched
    assert cfg.for_input(jnp.zeros((4, 100))).n_mics == 4
    assert cfg.for_input(jnp.zeros((8, 4, 100))).n_mics == 4  # batched


def test_tracked_learned_path_runs():
    """The learned tracked path (mask net steered per chunk) compiles and
    produces finite audio; the track itself is model-independent."""
    from azoom.models.unet import TPUFPU

    sc = _moving_scene(n=64_000, seed=9)
    model = TPUFPU(base=8, fold=4, bneck=4)
    F = CFG.n_fft // 2 + 1
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, F, 16, 4), jnp.float32)
    )
    out, theta = tracked_autosteer_enhance(
        sc["mixture"], CFG, fov_center_deg=90.0, fov_width_deg=120.0,
        model=model, variables=variables, feature_kind="physics",
    )
    assert out.shape == sc["target_ref"].shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert theta.shape[0] >= 2


def test_moving_room_scene_constant_traj_matches_static_render():
    """A constant trajectory through the moving-ROOM builder must reproduce
    the plain static image-source render of that position (the Hann COLA
    crossfade of identical per-block RIRs is exact; measured 5e-6)."""
    from azoom.config import RoomConfig
    from azoom.sim.motion import make_moving_room_scene
    from azoom.sim.room import fft_convolve, inverse_sabine, rir_matrix

    room = RoomConfig().with_mic_dist(0.04)
    fs, n = 16_000, 32_000
    sigs = speech_like_batch(jax.random.PRNGKey(3), 2, n, fs)
    B = traj_block_count(n, 2048)
    sc = make_moving_room_scene(
        jax.random.PRNGKey(0), sigs[0], sigs[1:2],
        jnp.full((B,), 90.0), room, fs, max_order=4,
    )
    assert sc["mixture"].shape == (2, n)
    assert bool(jnp.all(jnp.isfinite(sc["mixture"])))

    mics = jnp.asarray(room.mic_locs, jnp.float32)
    pos = jnp.mean(mics, 0) + jnp.asarray([0.0, 1.0, 0.0])  # 90 deg, r=1
    absorption = inverse_sabine(room.rt60_target, room.room_dim)
    r = rir_matrix(pos[None], mics, room.room_dim, absorption, 4, fs,
                   min(int(0.6 * fs), n))[0]
    static = np.asarray(fft_convolve(sigs[0][None, :], r, n)[0])
    a = np.asarray(sc["target_ref"])
    a = a / (np.abs(a).max() + 1e-9)
    b = static / (np.abs(static).max() + 1e-9)
    assert np.max(np.abs(a - b)) < 1e-4


def test_moving_room_scene_tracked_pipeline_runs():
    """Tracked zoom on a reverberant moving scene: finite output and a
    track that moves with the glide (full quality numbers are the TPU
    study, scripts/moving_room_study.py)."""
    from azoom.config import RoomConfig
    from azoom.sim.motion import make_moving_room_scene

    room = RoomConfig().with_mic_dist(0.04)
    fs, n = 16_000, 64_000
    sigs = speech_like_batch(jax.random.PRNGKey(5), 3, n, fs)
    B = traj_block_count(n, 2048)
    sc = make_moving_room_scene(
        jax.random.PRNGKey(1), sigs[0], sigs[1:],
        linear_trajectory(60.0, 120.0, B), room, fs, max_order=4,
    )
    out, th = tracked_autosteer_enhance(
        sc["mixture"], PipelineConfig(mic_dist=0.04), 90.0, 110.0,
        tracker="causal",
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    th = np.asarray(th)
    # Reverb at this short length makes the heuristic histogram too noisy
    # for a direction assertion (quality numbers are the TPU study with
    # the learned masks); the contract here is composition: every chunk's
    # bearing stays inside the FOV gate.
    assert np.all(np.abs(th - 90.0) <= 55.0), th

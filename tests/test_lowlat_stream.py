"""Low-latency (hop-granularity) streaming: exactness and the facade mode.

The claim under test: azoom.stream.lowlat.OnlineEnhancer is a *stateful
re-execution* of the offline causal pipeline
(azoom.pipelines.online_learned.online_learned_enhance), not an
approximation — the CRN's convs have time-kernel 1, the LSTM carries are
threaded exactly, and the covariance recursion is the same exponential
update. So the streamed output must equal the offline output on every
finalized sample to float tolerance, for any push block size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.config import PipelineConfig
from azoom.eval.projection import sir_improvement_db
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04, angle_target_deg=75.0)


@pytest.fixture(scope="module")
def scene():
    sigs = speech_like_batch(jax.random.PRNGKey(2), 3, 32_000, CFG.fs)
    return make_scene(sigs[0], sigs[1:], 75.0, jnp.asarray([40.0, 130.0]),
                      CFG.mic_dist, CFG.fs)


@pytest.fixture(scope="module")
def crn():
    from azoom.models.pretrained import load_pretrained_crn_causal

    return load_pretrained_crn_causal()


def test_stream_matches_offline(scene, crn):
    from azoom.pipelines.online_learned import online_learned_enhance
    from azoom.stream.lowlat import OnlineEnhancer

    model, variables = crn
    mix = np.asarray(scene["mixture"])
    ref = np.asarray(online_learned_enhance(scene["mixture"], model, variables, CFG))

    oe = OnlineEnhancer(CFG, model, variables, steer_deg=75.0)
    outs = [oe.push(mix[:, i:i + 1000]) for i in range(0, mix.shape[1], 1000)]
    stream = np.concatenate(outs)
    n = stream.shape[0]
    assert n >= mix.shape[1] - 2 * CFG.n_fft
    np.testing.assert_allclose(stream, ref[:n], atol=1e-4)

    imp = sir_improvement_db(
        jnp.asarray(ref), scene["mixture"][0],
        scene["target_ref"], scene["interference_ref"],
    )
    assert float(imp) > 10.0  # measured ~+18.5 on this scene


def test_stream_block_size_invariance(scene, crn):
    from azoom.stream.lowlat import OnlineEnhancer

    model, variables = crn
    mix = np.asarray(scene["mixture"])[:, :16_000]

    def run(block):
        oe = OnlineEnhancer(CFG, model, variables, steer_deg=75.0)
        outs = [oe.push(mix[:, i:i + block]) for i in range(0, mix.shape[1], block)]
        return np.concatenate(outs)

    a, b = run(517), run(4_096)
    k = min(len(a), len(b))
    np.testing.assert_allclose(a[:k], b[:k], atol=1e-5)


def test_stream_latency_bound(crn):
    """Algorithmic latency: after pushing k samples, at least
    k - 2*hop samples must already be finalized (32-64 ms bound)."""
    from azoom.stream.lowlat import OnlineEnhancer

    model, variables = crn
    oe = OnlineEnhancer(CFG, model, variables)
    assert oe.latency_samples == CFG.n_fft  # 1024 samples = 64 ms @ 16 kHz
    rng = np.random.default_rng(0)
    total_in, total_out = 0, 0
    for _ in range(20):
        block = rng.standard_normal((2, 800)).astype(np.float32) * 0.1
        total_in += 800
        total_out += oe.push(block).shape[0]
        assert total_out >= total_in - 2 * CFG.hop
    assert total_out > 0


def test_stream_flush_and_reset(scene, crn):
    from azoom.stream.lowlat import OnlineEnhancer

    model, variables = crn
    mix = np.asarray(scene["mixture"])[:, :10_000]
    oe = OnlineEnhancer(CFG, model, variables)
    out = oe.push(mix)
    out_f = oe.flush()
    assert out.shape[0] + out_f.shape[0] >= 10_000  # whole clip finalized
    oe.reset()
    out2 = oe.push(mix)
    np.testing.assert_allclose(out, out2, atol=1e-6)  # state fully cleared


def test_facade_low_latency_mode(scene):
    """AudioZoom(latency='low'): hop-level streaming through the facade,
    with the default causal model, enhancing a real scene."""
    from azoom.zoom_api import AudioZoom

    z = AudioZoom(cfg=CFG, direction_deg=75.0, latency="low")
    assert z.model == "crn_causal"
    mix = np.asarray(scene["mixture"])
    outs = [z.push(mix[:, i:i + 2048]) for i in range(0, mix.shape[1], 2048)]
    out = np.concatenate(outs)
    assert out.shape[0] >= mix.shape[1] - 2 * CFG.n_fft

    imp = sir_improvement_db(
        jnp.asarray(out), scene["mixture"][0, :out.shape[0]],
        scene["target_ref"][:out.shape[0]],
        scene["interference_ref"][:out.shape[0]],
    )
    assert float(imp) > 8.0

    # Whole-clip enhancement routes through the same causal pipeline.
    whole = z.enhance(mix)
    assert whole.shape == (mix.shape[1],)

    # set_zoom propagates direction without recompiling (traced steer).
    z.set_zoom(direction_deg=80.0)
    assert z._online.steer_deg == 80.0

    # ... and the zoom level -> diagonal loading too (traced sigma): the
    # facade's core contract must hold mid-stream in low-latency mode.
    z.set_zoom(zoom=0.9)
    assert z._online.sigma == pytest.approx(z.sigma)
    z.push(mix[:, :2048])  # still streams after the change


def test_facade_low_latency_rejects_noncausal_model():
    from azoom.zoom_api import AudioZoom

    with pytest.raises(ValueError, match="causal"):
        AudioZoom(cfg=CFG, latency="low", model="fpu")


def test_facade_int8_flag():
    """AudioZoom(int8=True) serves the bundled net on the int8-MXU path
    (ADVICE round 2: the benchmarked flagship configuration must be
    reachable from the product facade)."""
    from azoom.zoom_api import AudioZoom

    z = AudioZoom(cfg=PipelineConfig(mic_dist=0.04), model="fpu", int8=True)
    net = z._mask_net[0]
    assert net.quant  # the int8 serving variant of the architecture
    sigs = speech_like_batch(jax.random.PRNGKey(5), 2, 32_000, CFG.fs)
    sc = make_scene(sigs[0], sigs[1:2], 90.0, jnp.asarray([40.0]),
                    CFG.mic_dist, CFG.fs)
    out = z.enhance(np.asarray(sc["mixture"]))
    imp = sir_improvement_db(
        jnp.asarray(out), sc["mixture"][0], sc["target_ref"],
        sc["interference_ref"],
    )
    assert float(imp) > 8.0


def test_facade_low_latency_tracking_follows_walker():
    """track=True composes with latency='low': the forward-Viterbi bearing
    filter advances once per second of received audio and retargets the
    compiled per-hop step (traced steer input), while output latency stays
    at one hop. On a talker walking away from the camera axis, tracking
    must beat the fixed-steer stream by several dB (measured +17.6 vs
    +9.9 on this scene — thresholds well inside that gap)."""
    from azoom.sim.motion import (
        linear_trajectory, make_moving_scene, traj_block_count,
    )
    from azoom.zoom_api import AudioZoom

    cfg = PipelineConfig(mic_dist=0.04)
    n = 128_000  # 8 s: the walk needs time to leave the camera axis
    sigs = speech_like_batch(jax.random.PRNGKey(7), 3, n, cfg.fs)
    sc = make_moving_scene(
        sigs[0], sigs[1:],
        linear_trajectory(65.0, 120.0, traj_block_count(n, 2048)),
        jnp.asarray([25.0, 160.0]), cfg.mic_dist, cfg.fs,
    )
    mix = np.asarray(sc["mixture"])

    def run(track):
        z = AudioZoom(cfg=cfg, direction_deg=65.0, fov_deg=130.0,
                      latency="low", track=track)
        outs = [z.push(mix[:, i:i + 1600]) for i in range(0, n, 1600)]
        return np.concatenate([o for o in outs if o.size]), z

    out_f, _ = run(False)
    out_t, zt = run(True)
    m = min(len(out_f), len(out_t))

    def imp(out):
        return float(sir_improvement_db(
            jnp.asarray(out[:m]), sc["mixture"][0, :m],
            sc["target_ref"][:m], sc["interference_ref"][:m],
        ))

    assert np.isfinite(out_t).all()
    # The tracker followed the walk (ends near 120, started near 65).
    assert zt._track_theta is not None and zt._track_theta > 100.0
    assert imp(out_t) > imp(out_f) + 3.0
    assert imp(out_t) > 12.0


def test_facade_low_latency_tracking_panning_camera():
    """The full audio-visual product story at 32 ms latency: the camera
    visually follows the talker (set_zoom pans the FOV gate mid-stream,
    no recompile) while the audio tracker refines the bearing inside it.
    A NARROW panning FOV beats the static wide-FOV run because the gate
    keeps every distractor out for the whole walk (measured +18.8 dB vs
    +17.6 static camera / 130-deg FOV on this scene)."""
    from azoom.sim.motion import (
        linear_trajectory, make_moving_scene, traj_block_count,
    )
    from azoom.zoom_api import AudioZoom

    cfg = PipelineConfig(mic_dist=0.04)
    n = 128_000
    sigs = speech_like_batch(jax.random.PRNGKey(7), 3, n, cfg.fs)
    sc = make_moving_scene(
        sigs[0], sigs[1:],
        linear_trajectory(65.0, 120.0, traj_block_count(n, 2048)),
        jnp.asarray([25.0, 160.0]), cfg.mic_dist, cfg.fs,
    )
    mix = np.asarray(sc["mixture"])

    z = AudioZoom(cfg=cfg, direction_deg=65.0, fov_deg=60.0,
                  latency="low", track=True)
    outs = []
    for i in range(0, n, 1600):
        z.set_zoom(direction_deg=65.0 + (120.0 - 65.0) * (i / n))
        outs.append(z.push(mix[:, i:i + 1600]))
    out = np.concatenate([o for o in outs if o.size])
    m = len(out)

    assert np.isfinite(out).all()
    assert z._track_theta is not None and z._track_theta > 100.0
    imp = float(sir_improvement_db(
        jnp.asarray(out), sc["mixture"][0, :m],
        sc["target_ref"][:m], sc["interference_ref"][:m],
    ))
    assert imp > 14.0, imp

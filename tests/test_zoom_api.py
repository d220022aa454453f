"""AudioZoom facade tests: zoom state, whole-clip enhancement, stateful
streaming reconstruction and block-size invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.eval.projection import sir_improvement_db
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.zoom_api import AudioZoom

CFG = PipelineConfig(mic_dist=0.04)


def test_zoom_state():
    z = AudioZoom(cfg=CFG)
    z.set_zoom(direction_deg=60.0, fov_deg=30.0, zoom=1.0)
    assert z.direction_deg == 60.0 and z.fov_deg == 30.0
    sigma_narrow = z.sigma
    z.set_zoom(zoom=0.0)
    assert z.sigma > sigma_narrow  # wide = more loading


def test_whole_clip_enhances():
    sigs = speech_like_batch(jax.random.PRNGKey(2), 2, 32_000, CFG.fs)
    sc = make_scene(sigs[0], sigs[1:2], 60.0, jnp.asarray([130.0]),
                    CFG.mic_dist, CFG.fs)
    z = AudioZoom(cfg=CFG, direction_deg=70.0, fov_deg=60.0)
    out = z.enhance(sc["mixture"])
    assert out.shape == (32_000,)
    imp = sir_improvement_db(
        jnp.asarray(out), sc["mixture"][0], sc["target_ref"],
        sc["interference_ref"],
    )
    assert float(imp) > 2.0


def test_streaming_passthrough_reconstruction(rng):
    """With an identity enhance_fn, the stream must reproduce the input
    exactly (steady state), for any push block size."""
    n = 120_000
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.3

    def run(block):
        z = AudioZoom(cfg=CFG, enhance_fn=lambda w: w[0])
        outs = []
        for i in range(0, n, block):
            outs.append(z.push(x[:, i : i + block]))
        return np.concatenate(outs)

    out = run(5_000)
    # Output sample i corresponds to input sample i + hop (the stream emits
    # starting from the second window's overlap region).
    hop = CFG.win_size // 2
    m = len(out)
    assert m >= n - 2 * CFG.win_size
    np.testing.assert_allclose(out, x[0, hop : hop + m], atol=1e-4)

    # Block-size invariance.
    out2 = run(1_234)
    k = min(len(out), len(out2))
    np.testing.assert_allclose(out[:k], out2[:k], atol=1e-5)


def test_pipelined_stream_matches_direct(rng):
    """pipelined=True (double-buffered serve, round 4) must produce the
    SAME samples as the direct path — one window later, with flush()
    draining the in-flight window at stream end."""
    n = 120_000
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.3

    def run(pipelined, block):
        z = AudioZoom(cfg=CFG, enhance_fn=lambda w: w[0],
                      pipelined=pipelined)
        outs = []
        for i in range(0, n, block):
            outs.append(z.push(x[:, i : i + block]))
        outs.append(z.flush())
        return np.concatenate(outs)

    direct = run(False, 16_000)
    piped = run(True, 16_000)
    # pipelining defers by one window but flush() drains it: same stream
    k = min(len(direct), len(piped))
    assert k >= n - 3 * CFG.win_size
    np.testing.assert_allclose(piped[:k], direct[:k], atol=1e-5)
    # block-size invariance holds in pipelined mode too
    piped2 = run(True, 7_000)
    k = min(len(piped), len(piped2))
    np.testing.assert_allclose(piped[:k], piped2[:k], atol=1e-5)


def test_pipelined_push_defers_one_window(rng):
    """The first window's output appears one push later than direct mode
    (the pipeline fill), then the stream runs continuously."""
    x = rng.standard_normal((2, 96_000)).astype(np.float32) * 0.3
    zd = AudioZoom(cfg=CFG, enhance_fn=lambda w: w[0])
    zp = AudioZoom(cfg=CFG, enhance_fn=lambda w: w[0], pipelined=True)
    win = CFG.win_size
    # push exactly one window: direct emits nothing yet (OLA warmup),
    # pipelined also nothing (window in flight)
    assert zd.push(x[:, :win]).size == 0
    assert zp.push(x[:, :win]).size == 0
    # second window: direct emits its first hop; pipelined still drains
    # window 1 only now -> also zero, then catches up
    d2 = zd.push(x[:, win : win + win // 2])
    p2 = zp.push(x[:, win : win + win // 2])
    assert d2.size > 0 and p2.size == 0
    p3 = zp.push(x[:, win + win // 2 : 2 * win])
    assert p3.size > 0
    np.testing.assert_allclose(p3[: d2.size], d2, atol=1e-6)


def test_zoom_api_with_bundled_model():
    """model= routes the facade through a bundled learned mask net."""
    import jax

    from azoom.config import PipelineConfig
    from azoom.eval.projection import osinr_osir
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like

    cfg = PipelineConfig(mic_dist=0.04)
    k = jax.random.split(jax.random.PRNGKey(11), 2)
    tgt = speech_like(k[0], 32_000, cfg.fs, 150.0)
    i1 = speech_like(k[1], 32_000, cfg.fs, 230.0)
    sc = make_scene(tgt, i1[None], 90.0, jnp.asarray([40.0]), cfg.mic_dist, cfg.fs)

    az = AudioZoom(cfg=cfg, model="fpu_multigeo")
    out = az.enhance(np.asarray(sc["mixture"]))
    _, sir = osinr_osir(jnp.asarray(out), sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(sir) - float(sir_in) > 10.0

    # harmonic_regen=True (the noisy-scene knob, RESULTS.md) must flow
    # through the facade: a different, finite output at the same shape.
    az_hr = AudioZoom(cfg=cfg, model="fpu_multigeo", harmonic_regen=True)
    out_hr = az_hr.enhance(np.asarray(sc["mixture"]))
    assert out_hr.shape == out.shape
    assert np.isfinite(out_hr).all()
    assert float(np.max(np.abs(out_hr - out))) > 1e-8


def test_zoom_api_m4_array():
    """Product facade on a 4-mic array: cfg.n_mics drives buffering and
    every enhancement path is M-general — the blind autosteered learned
    zoom must run and strongly improve a 3-interferer scene."""
    import jax

    from azoom.config import PipelineConfig
    from azoom.eval.projection import osinr_osir
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like

    cfg = PipelineConfig(n_mics=4, mic_dist=0.04)
    k = jax.random.split(jax.random.PRNGKey(11), 4)
    tgt = speech_like(k[0], 32_000, cfg.fs, 150.0)
    ints = jnp.stack([speech_like(k[1], 32_000, cfg.fs, 220.0),
                      speech_like(k[2], 32_000, cfg.fs, 120.0),
                      speech_like(k[3], 32_000, cfg.fs, 260.0)])
    sc = make_scene(tgt, ints, 90.0, jnp.asarray([30.0, 135.0, 60.0]),
                    cfg.mic_dist, cfg.fs, n_mics=4)

    az = AudioZoom(cfg=cfg, model="fpu_multigeo")
    out = az.enhance(np.asarray(sc["mixture"]))
    assert np.all(np.isfinite(out))
    _, sir = osinr_osir(jnp.asarray(out), sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(sir) - float(sir_in) > 10.0


def test_tracked_facade_follows_moving_talker():
    """track=True: whole-clip enhance() steers per chunk along the Viterbi
    track and beats the single-bearing facade on a moving talker; push()
    carries the causal tracker across windows."""
    from azoom.sim.motion import (
        linear_trajectory, make_moving_scene, traj_block_count,
    )

    # 8 cm pair: the heuristic DOA histogram resolves this 3-source
    # moving scene (at 4 cm its angular resolution is too coarse here —
    # the model-driven facade paths at 4 cm are covered elsewhere).
    cfg = PipelineConfig(mic_dist=0.08)
    n = 96_000
    sigs = speech_like_batch(jax.random.PRNGKey(7), 3, n, cfg.fs)
    B = traj_block_count(n, 2048)
    sc = make_moving_scene(
        sigs[0], sigs[1:], linear_trajectory(55.0, 125.0, B),
        jnp.asarray([25.0, 155.0]), cfg.mic_dist, cfg.fs,
    )
    zt = AudioZoom(cfg=cfg, direction_deg=90.0, fov_deg=100.0, track=True)
    zs = AudioZoom(cfg=cfg, direction_deg=90.0, fov_deg=100.0)
    imp_t = sir_improvement_db(
        jnp.asarray(zt.enhance(sc["mixture"])), sc["mixture"][0],
        sc["target_ref"], sc["interference_ref"],
    )
    imp_s = sir_improvement_db(
        jnp.asarray(zs.enhance(sc["mixture"])), sc["mixture"][0],
        sc["target_ref"], sc["interference_ref"],
    )
    assert float(imp_t) > float(imp_s) + 2.0, (imp_t, imp_s)

    # Streaming: the causal tracker state follows the glide window to
    # window (bearing strictly increases across the clip).
    zp = AudioZoom(cfg=cfg, direction_deg=90.0, fov_deg=100.0, track=True)
    first = None
    for i in range(0, n, 16_000):
        zp.push(np.asarray(sc["mixture"][:, i : i + 16_000]))
        if first is None and zp._track_theta is not None:
            first = zp._track_theta
    assert first is not None and zp._track_theta > first + 20.0
    zp.reset()
    assert zp._track_theta is None


def test_facade_mask_reuse_stream():
    """mask_reuse=True routes push() through the single-slot server
    (round 5): output matches AudioZoomServer(1) exactly, enhances the
    scene, and set_zoom pans propagate mid-stream without error."""
    from azoom.stream.server import AudioZoomServer

    cfg = PipelineConfig(mic_dist=0.04, win_size=32_768)
    n = cfg.win_size + 2 * (cfg.win_size // 2)
    sigs = speech_like_batch(jax.random.PRNGKey(31), 3, n, cfg.fs)
    sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.asarray([40.0, 130.0]),
                    cfg.mic_dist, cfg.fs)
    mix = np.asarray(sc["mixture"])

    az = AudioZoom(cfg=cfg, model="fpu", int8=False, mask_reuse=True,
                   dsp_precision="exact")
    outs = []
    for i in range(0, n, 10_000):
        outs.append(az.push(mix[:, i:i + 10_000]))
    out = np.concatenate(outs)

    srv = AudioZoomServer(1, cfg=cfg, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact",
                          mask_reuse=True)
    srv.set_zoom(0, zoom=az.zoom)  # the facade's zoom state -> sigma
    ref = srv.push(mix[None])[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)

    hop = cfg.win_size // 2
    m = out.shape[0]
    imp = sir_improvement_db(
        jnp.asarray(out), sc["mixture"][0, hop:hop + m],
        sc["target_ref"][hop:hop + m], sc["interference_ref"][hop:hop + m])
    assert float(imp) > 3.0, float(imp)

    az.set_zoom(direction_deg=95.0, zoom=0.8)  # mid-stream pan: no error
    az.push(mix[:, :hop])
    az.reset()
    assert az.push(mix[:, :1_000]).size == 0

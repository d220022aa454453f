"""Batched live serving (azoom.stream.server.AudioZoomServer): S
concurrent streams through one compiled step per tick."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.stream.server import AudioZoomServer

CFG = PipelineConfig(mic_dist=0.04)


def _scenes(S, n, seed=0):
    """S independent 2-interferer scenes; target at 90 deg."""
    mixes, tgts, itfs = [], [], []
    for s in range(S):
        sigs = speech_like_batch(jax.random.PRNGKey(seed + s), 3, n, CFG.fs)
        sc = make_scene(sigs[0], sigs[1:], 90.0,
                        jnp.asarray([40.0, 130.0]), CFG.mic_dist, CFG.fs)
        mixes.append(np.asarray(sc["mixture"]))
        tgts.append(np.asarray(sc["target_ref"]))
        itfs.append(np.asarray(sc["interference_ref"]))
    return np.stack(mixes), np.stack(tgts), np.stack(itfs)


def test_server_shapes_and_accounting():
    S, n = 3, 3 * CFG.win_size
    mixes, _, _ = _scenes(S, n)
    srv = AudioZoomServer(S, cfg=CFG, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact")
    block = 8_000
    total = 0
    for i in range(0, n, block):
        out = srv.push(mixes[:, :, i : i + block])
        assert out.shape[0] == S
        assert out.shape[1] % (CFG.win_size // 2) == 0
        assert np.all(np.isfinite(out))
        total += out.shape[1]
    # everything but the warm-up hop and the unfinalized tail comes out
    assert total >= n - 2 * CFG.win_size


def test_server_streams_are_independent_and_enhance():
    """Every stream's row improves ITS OWN scene's SIR; rows are not
    copies of each other."""
    S, n = 3, 3 * CFG.win_size
    mixes, tgts, itfs = _scenes(S, n, seed=11)
    srv = AudioZoomServer(S, cfg=CFG, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact")
    out = srv.push(mixes)  # one big push: all windows ready at once
    hop = CFG.win_size // 2
    m = out.shape[1]
    assert m > 0
    for s in range(S):
        _, sir_in = osinr_osir(
            jnp.asarray(mixes[s, 0, hop : hop + m]),
            jnp.asarray(tgts[s, hop : hop + m]),
            jnp.asarray(itfs[s, hop : hop + m]))
        _, sir_out = osinr_osir(
            jnp.asarray(out[s]), jnp.asarray(tgts[s, hop : hop + m]),
            jnp.asarray(itfs[s, hop : hop + m]))
        assert float(sir_out - sir_in) > 3.0, (s, float(sir_out - sir_in))
    assert not np.allclose(out[0], out[1])


def test_server_with_explicit_geometry():
    """The batched server composes with mic_positions (round-4
    geometry axis): 4-mic rectangle streams run end to end."""
    RECT = ((-0.015, -0.01), (0.015, -0.01), (-0.015, 0.01), (0.015, 0.01))
    cfg = PipelineConfig(mic_dist=0.04).with_geometry(RECT)
    S, n = 2, 2 * cfg.win_size
    mixes = []
    for s in range(S):
        sigs = speech_like_batch(jax.random.PRNGKey(20 + s), 2, n, cfg.fs)
        sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.asarray([40.0]),
                        0.0, cfg.fs, n_mics=4,
                        positions=jnp.asarray(RECT, jnp.float32))
        mixes.append(np.asarray(sc["mixture"]))
    srv = AudioZoomServer(S, cfg=cfg, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact")
    out = srv.push(np.stack(mixes))
    assert out.shape[0] == S and out.shape[1] > 0
    assert np.all(np.isfinite(out))


def test_server_per_stream_steering():
    """set_zoom steers stream 1 only: aiming it at its true 60-degree
    target beats leaving it at the (wrong) 90-degree default."""
    S, n = 2, 2 * CFG.win_size
    # stream 0: target at 90; stream 1: target at 60, interferer at 120
    sigs0 = speech_like_batch(jax.random.PRNGKey(3), 2, n, CFG.fs)
    sc0 = make_scene(sigs0[0], sigs0[1:], 90.0, jnp.asarray([130.0]),
                     CFG.mic_dist, CFG.fs)
    sigs1 = speech_like_batch(jax.random.PRNGKey(4), 2, n, CFG.fs)
    sc1 = make_scene(sigs1[0], sigs1[1:], 60.0, jnp.asarray([120.0]),
                     CFG.mic_dist, CFG.fs)
    mixes = np.stack([np.asarray(sc0["mixture"]), np.asarray(sc1["mixture"])])

    def run(steer1):
        srv = AudioZoomServer(S, cfg=CFG, model="fpu", int8=False,
                              use_pallas=False, dsp_precision="exact")
        srv.set_zoom(1, direction_deg=steer1)
        return srv.push(mixes)

    out_right = run(60.0)
    out_wrong = run(120.0)
    hop = CFG.win_size // 2
    m = out_right.shape[1]
    t1 = jnp.asarray(np.asarray(sc1["target_ref"])[hop : hop + m])
    i1 = jnp.asarray(np.asarray(sc1["interference_ref"])[hop : hop + m])
    _, sir_right = osinr_osir(jnp.asarray(out_right[1]), t1, i1)
    _, sir_wrong = osinr_osir(jnp.asarray(out_wrong[1]), t1, i1)
    assert float(sir_right) > float(sir_wrong) + 3.0

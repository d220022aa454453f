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


# ---------------------------------------------------------------------------
# Round-5 server v2 surfaces
# ---------------------------------------------------------------------------

import pytest

from azoom.dsp.stft import istft  # noqa: F401  (parity test helpers)


def test_server_matches_single_stream_path():
    """ADVICE r4 #3: a PANNED stream through the batched server must
    match the single-stream learned path (steer-aligned features) —
    hand-OLA of learned_enhance windows == the server's output row."""
    from azoom.pipelines.learned import learned_enhance
    from azoom.models.pretrained import load_bundled

    n = CFG.win_size + CFG.win_size // 2
    sigs = speech_like_batch(jax.random.PRNGKey(7), 3, n, CFG.fs)
    sc = make_scene(sigs[0], sigs[1:], 60.0, jnp.asarray([110.0, 20.0]),
                    CFG.mic_dist, CFG.fs)
    mix = np.asarray(sc["mixture"])

    srv = AudioZoomServer(2, cfg=CFG, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact")
    srv.set_zoom(0, direction_deg=60.0)
    srv.set_zoom(1, direction_deg=60.0)
    out = srv.push(np.stack([mix, mix]))
    assert out.shape == (2, CFG.win_size // 2)

    model, variables, fk = load_bundled("fpu", quant=False)
    win, hop = CFG.win_size, CFG.win_size // 2
    e1 = np.asarray(learned_enhance(
        jnp.asarray(mix[:, :win]), model, variables, CFG, feature_kind=fk,
        steer_deg=jnp.float32(60.0), dsp_precision="exact"))
    e2 = np.asarray(learned_enhance(
        jnp.asarray(mix[:, hop:hop + win]), model, variables, CFG,
        feature_kind=fk, steer_deg=jnp.float32(60.0),
        dsp_precision="exact"))
    w = np.hanning(win + 1)[:-1]
    norm = np.maximum(w[:hop] + w[hop:], 1e-6)
    expected = ((e1 * w)[hop:] + (e2 * w)[:hop]) / norm
    scale = np.max(np.abs(expected)) + 1e-12
    err = np.max(np.abs(out[0] - expected)) / scale
    assert err < 1e-3, f"server vs single-stream rel err {err}"
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_server_int16_wire():
    """int16 PCM wire: in/out dtype is int16 and the audio matches the
    float32 wire within quantization (the transport-cut config)."""
    S, n = 2, 2 * CFG.win_size
    mixes, _, _ = _scenes(S, n, seed=5)
    kw = dict(cfg=CFG, model="fpu", int8=False, use_pallas=False,
              dsp_precision="exact")
    srv_f = AudioZoomServer(S, wire="float32", **kw)
    srv_i = AudioZoomServer(S, wire="int16", **kw)
    out_f = srv_f.push(mixes)
    out_i = srv_i.push(mixes)
    assert out_i.dtype == np.int16
    assert out_f.shape == out_i.shape
    # int16 wire quantizes input AND output: tolerance a few LSB.
    err = np.max(np.abs(out_i.astype(np.float32) / 32767.0 - out_f))
    assert err < 5e-3, f"int16 wire deviates by {err}"
    # int16 input blocks are accepted directly
    srv_i2 = AudioZoomServer(S, wire="int16", **kw)
    blocks_i16 = np.clip(mixes * 32767.0, -32767, 32767).astype(np.int16)
    out_i2 = srv_i2.push(blocks_i16)
    np.testing.assert_array_equal(out_i, out_i2)


def test_server_mask_reuse_quality():
    """mask_reuse=True (frame-aligned geometry): same scenes enhance to
    within a dB of the full-mask server — the measured-quality-free
    serving lever, wired end to end."""
    cfg = PipelineConfig(mic_dist=0.04, win_size=32_768)
    S = 2
    n = cfg.win_size + 3 * (cfg.win_size // 2)
    mixes, tgts, itfs = [], [], []
    for s in range(S):
        sigs = speech_like_batch(jax.random.PRNGKey(40 + s), 3, n, cfg.fs)
        sc = make_scene(sigs[0], sigs[1:], 90.0, jnp.asarray([40.0, 130.0]),
                        cfg.mic_dist, cfg.fs)
        mixes.append(np.asarray(sc["mixture"]))
        tgts.append(np.asarray(sc["target_ref"]))
        itfs.append(np.asarray(sc["interference_ref"]))
    mixes = np.stack(mixes)
    kw = dict(cfg=cfg, model="fpu", int8=False, use_pallas=False,
              dsp_precision="exact")
    out_full = AudioZoomServer(S, mask_reuse=False, **kw).push(mixes)
    out_reuse = AudioZoomServer(S, mask_reuse=True, **kw).push(mixes)
    assert out_full.shape == out_reuse.shape
    hop = cfg.win_size // 2
    m = out_full.shape[1]
    for s in range(S):
        t = jnp.asarray(tgts[s][hop:hop + m])
        i = jnp.asarray(itfs[s][hop:hop + m])
        _, sir_in = osinr_osir(jnp.asarray(mixes[s, 0, hop:hop + m]), t, i)
        _, sir_f = osinr_osir(jnp.asarray(out_full[s]), t, i)
        _, sir_r = osinr_osir(jnp.asarray(out_reuse[s]), t, i)
        imp_f, imp_r = float(sir_f - sir_in), float(sir_r - sir_in)
        assert imp_f > 3.0 and imp_r > 3.0, (s, imp_f, imp_r)
        assert abs(imp_f - imp_r) < 2.0, (s, imp_f, imp_r)


def test_server_mesh_sharded(devices8):
    """VERDICT r4 #3: the stream axis shards over a Mesh — the 8-device
    server tick matches the single-device tick with per-stream steering."""
    from jax.sharding import Mesh

    S, n = 8, 2 * CFG.win_size
    mixes, _, _ = _scenes(S, n, seed=30)
    kw = dict(cfg=CFG, model="fpu", int8=False, use_pallas=False,
              dsp_precision="exact")

    def steer(srv):
        for s in range(S):
            srv.set_zoom(s, direction_deg=60.0 + 10.0 * s,
                         zoom=0.1 * s)  # heterogeneous widths too

    srv_1 = AudioZoomServer(S, **kw)
    steer(srv_1)
    out_1 = srv_1.push(mixes)

    mesh = Mesh(np.asarray(devices8), ("streams",))
    srv_8 = AudioZoomServer(S, mesh=mesh, **kw)
    steer(srv_8)
    out_8 = srv_8.push(mixes)
    assert out_8.shape == out_1.shape and out_8.shape[1] > 0
    scale = np.max(np.abs(out_1)) + 1e-12
    err = np.max(np.abs(out_8 - out_1)) / scale
    assert err < 1e-4, f"sharded server mismatch: rel {err}"


def test_server_attach_detach():
    """Stream churn: detaching+reattaching slot 1 leaves slot 0's audio
    untouched, and the reattached slot recovers (enhances) after its
    one-window warm-up."""
    S, n = 2, 4 * CFG.win_size
    mixes, tgts, itfs = _scenes(S, n, seed=21)
    kw = dict(cfg=CFG, model="fpu", int8=False, use_pallas=False,
              dsp_precision="exact")
    hop = CFG.win_size // 2

    srv_ref = AudioZoomServer(S, **kw)
    out_ref = srv_ref.push(mixes)

    srv = AudioZoomServer(S, **kw)
    chunks = []
    # windows 1-2 normally; then churn slot 1 and continue
    chunks.append(srv.push(mixes[:, :, : 2 * CFG.win_size]))
    srv.detach(1)
    srv.attach(1, direction_deg=90.0)
    chunks.append(srv.push(mixes[:, :, 2 * CFG.win_size:]))
    out = np.concatenate(chunks, axis=1)
    assert out.shape == out_ref.shape
    # slot 0 is bit-unaffected by slot 1's churn
    np.testing.assert_allclose(out[0], out_ref[0], atol=1e-6)
    # slot 1's post-warm-up tail still enhances its scene
    m = out.shape[1]
    tail = slice(m - hop, m)
    t = jnp.asarray(tgts[1][hop:hop + m][tail])
    i = jnp.asarray(itfs[1][hop:hop + m][tail])
    _, sir_in = osinr_osir(
        jnp.asarray(mixes[1, 0, hop:hop + m][tail]), t, i)
    _, sir_out = osinr_osir(jnp.asarray(out[1][tail]), t, i)
    assert float(sir_out - sir_in) > 3.0


@pytest.mark.slow
def test_server_tracking_follows_per_stream():
    """VERDICT r4 #4: track=True runs a PER-STREAM momentum bearing
    filter — stream 0's talker glides (and crosses its interferer)
    while stream 1 stays static; stream 0's bearing follows the glide,
    stream 1's stays put."""
    from azoom.sim.motion import (
        linear_trajectory, make_moving_scene, traj_block_count,
    )

    cfg = PipelineConfig(mic_dist=0.08, win_size=16_000)
    n = 6 * cfg.fs
    B = traj_block_count(n, 2_048)
    sigs = speech_like_batch(jax.random.PRNGKey(9), 2, n, cfg.fs)
    # stream 0: talker glides 60 -> 100 deg THROUGH the 80-deg interferer
    sc0 = make_moving_scene(
        sigs[0], sigs[1:], linear_trajectory(60.0, 100.0, B),
        jnp.asarray([80.0]), cfg.mic_dist, cfg.fs)
    # stream 1: static talker at 120
    sigs1 = speech_like_batch(jax.random.PRNGKey(10), 2, n, cfg.fs)
    sc1 = make_scene(sigs1[0], sigs1[1:], 120.0, jnp.asarray([40.0]),
                     cfg.mic_dist, cfg.fs)
    mixes = np.stack([np.asarray(sc0["mixture"]),
                      np.asarray(sc1["mixture"])])

    srv = AudioZoomServer(2, cfg=cfg, model="fpu", int8=False,
                          use_pallas=False, dsp_precision="exact",
                          track=True, fov_deg=120.0)
    srv.set_zoom(0, direction_deg=60.0)
    srv.set_zoom(1, direction_deg=120.0)
    out = srv.push(mixes)
    assert np.all(np.isfinite(out))
    b = srv.bearings
    assert b[0] > 80.0, f"stream 0 did not follow the glide: {b[0]}"
    assert abs(b[1] - 120.0) <= 10.0, f"stream 1 drifted: {b[1]}"

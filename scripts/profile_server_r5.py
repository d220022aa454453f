"""Round-5 server tick table: mask-reuse + int16 wire + tracking + pans.

Measures what a live media server actually pays per tick (host wall:
upload + dispatch + compute + fetch) for the v2 AudioZoomServer on the
real chip, across the round-5 serving configurations:

  r4-shape   full masks, float32 wire (the round-4 accounting baseline —
             note the v2 server already uploads only the new hop, where
             round 4 re-uploaded the full window every tick)
  reuse      frame-aligned mask reuse, float32 wire
  reuse+i16  mask reuse + int16 PCM wire (the production config)
  +track     ... + per-stream momentum tracking (one extra (S, A) fetch)
  pan        reuse+i16 while EVERY tick changes every stream's direction
             and zoom width (the VERDICT r4 #8 trap: this must not
             recompile or stall — sigma and steering are traced)

A config sustains real time when tick wall < hop/fs = 1.024 s.

Run: timeout 900 python scripts/profile_server_r5.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.stream.server import AudioZoomServer

CFG = PipelineConfig(mic_dist=0.04, win_size=32_768)
HOP = CFG.win_size // 2
TICK_S = HOP / CFG.fs
N_TICKS = 12
rng = np.random.default_rng(0)


def run(S, label, pan=False, **kw):
    srv = AudioZoomServer(S, cfg=CFG, model="tpufpu_nano", int8=True,
                          dsp_precision="fast", **kw)
    blocks = (rng.standard_normal((S, 2, HOP)) * 0.1).astype(np.float32)
    srv.push(np.concatenate([blocks, blocks], axis=2))  # prime (win)
    srv.push(blocks)  # first tick compile
    times = []
    for t in range(N_TICKS):
        if pan:
            for s in range(S):
                srv.set_zoom(s, direction_deg=60.0 + (t * 7 + s) % 60,
                             zoom=((t + s) % 10) / 10.0)
        t0 = time.perf_counter()
        out = srv.push(blocks)
        times.append(time.perf_counter() - t0)
        assert out.shape == (S, HOP)
    times = np.asarray(times)
    p50, p95, mx = (np.percentile(times, 50), np.percentile(times, 95),
                    times.max())
    ok = "sustains" if p50 < TICK_S else "MISSES"
    print(f"S={S:4d} {label:12s}: tick p50 {p50*1e3:7.1f} ms  "
          f"p95 {p95*1e3:7.1f}  max {mx*1e3:7.1f}  "
          f"{S*TICK_S/p50:7.1f} stream-s/s/chip  [{ok}]", flush=True)
    return p50


def run_compute(S, label, **kw):
    """Dispatch+compute-only tick (inputs device-resident, no host
    transfer): what a co-located deployment pays — isolates the
    mask-reuse compute saving the tunnel transport hides."""
    import jax
    import jax.numpy as jnp
    from azoom.stream.server import _tick_step

    srv = AudioZoomServer(S, cfg=CFG, model="tpufpu_nano", int8=True,
                          dsp_precision="fast", **kw)
    blocks = (rng.standard_normal((S, 2, HOP)) * 0.1).astype(np.float32)
    srv.push(np.concatenate([blocks, blocks], axis=2))  # prime
    hopd = jnp.asarray(blocks)
    steer = jnp.asarray(srv._steer)
    sigma = jnp.asarray(srv._sigma)
    reset = jnp.zeros(S, bool)
    state = (srv._dev_win, srv._dev_tail, srv._dev_mask)

    # On the axon tunnel block_until_ready does not actually block, so
    # time N ticks INSIDE one jitted scan and fetch a scalar (the
    # round-4 in-jit timing recipe).
    @jax.jit
    def n_ticks(state):
        def body(st, _):
            out, w, t, m, _h = _tick_step(
                st[0], st[1], st[2], hopd, steer, sigma, reset,
                srv._variables, srv._model, srv.cfg, srv._fk,
                srv._use_pallas, srv._dsp_precision, srv._ipd_scale,
                srv._pair_mode, False, srv._reuse, False,
            )
            return (w, t, m), jnp.sum(jnp.abs(out))
        st, sums = jax.lax.scan(body, state, None, length=N_TICKS)
        return jnp.sum(sums)

    float(n_ticks(state))  # compile
    t0 = time.perf_counter()
    float(n_ticks(state))
    p50 = (time.perf_counter() - t0) / N_TICKS
    print(f"S={S:4d} {label:12s}: compute-only tick {p50*1e3:7.1f} ms  "
          f"{S*TICK_S/p50:7.1f} stream-s/s/chip (co-located bound)",
          flush=True)
    return p50


def main():
    if "--compute" in sys.argv:
        s_values = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64]
        for S in s_values:
            full = run_compute(S, "full-net")
            ruse = run_compute(S, "reuse", mask_reuse=True)
            print(f"           compute reuse uplift {full/ruse:.2f}x",
                  flush=True)
        return
    s_values = [int(a) for a in sys.argv[1:]] or [16, 64, 128, 256]
    for S in s_values:
        base = run(S, "r4-shape")
        ruse = run(S, "reuse", mask_reuse=True)
        ri16 = run(S, "reuse+i16", mask_reuse=True, wire="int16")
        run(S, "reuse+i16+trk", mask_reuse=True, wire="int16", track=True,
            fov_deg=120.0)
        run(S, "pan", pan=True, mask_reuse=True, wire="int16")
        print(f"           reuse uplift {base/ruse:.2f}x; "
              f"i16 uplift over f32 {ruse/ri16:.2f}x; "
              f"total {base/ri16:.2f}x", flush=True)


if __name__ == "__main__":
    main()

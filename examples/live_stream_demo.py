"""Live streaming demo: feed audio blocks through the AudioZoom facade.

Simulates an audio-callback producer (arbitrary block sizes) pushing into
the stateful streaming API while the "camera" pans mid-stream — the
product interaction model (visual zoom driving the acoustic beam). Works
on CPU or TPU; uses the bundled spacing-robust mask net.

Run: python examples/live_stream_demo.py [--model fpu_multigeo] [--blocksize 1600]
     [--latency low] [--track]   (--track: the talker walks 60->120 deg and
     the stream's forward-Viterbi bearing filter follows them)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from azoom import AudioZoom, PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fpu_multigeo",
                   choices=["autosteer", "fpu", "fpu_multigeo", "fpu_reverb",
                            "deepfpu", "tpufpu", "crn_causal"])
    p.add_argument("--blocksize", type=int, default=1_600,
                   help="producer block size in samples (100 ms @ 16 kHz)")
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--latency", default="high", choices=["high", "low"],
                   help="low = hop-granularity causal streaming "
                        "(32-64 ms algorithmic latency, CRN mask net)")
    p.add_argument("--track", action="store_true",
                   help="moving-talker mode: the target walks 60->120 deg "
                        "and push() follows it with the forward-Viterbi "
                        "bearing filter (AudioZoom track=True)")
    p.add_argument("--crossing", action="store_true",
                   help="with --track: the louder interferer glides "
                        "120->60 deg so its bearing CROSSES the target's; "
                        "pairs with --tracker momentum (round 4)")
    p.add_argument("--tracker", default="causal",
                   choices=["causal", "momentum"],
                   help="streaming bearing filter: 'momentum' keeps "
                        "identity through a bearing crossing "
                        "(azoom.localize.tracking.momentum_track)")
    args = p.parse_args()

    cfg = PipelineConfig(mic_dist=0.04)
    n = int(args.seconds * cfg.fs)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    if args.track:
        from azoom.sim.motion import (
            linear_trajectory, make_moving_scene, traj_block_count,
        )

        scene = make_moving_scene(
            speech_like(keys[0], n, cfg.fs, 150.0),
            jnp.stack([speech_like(keys[1], n, cfg.fs, 220.0),
                       speech_like(keys[2], n, cfg.fs, 120.0)]),
            linear_trajectory(60.0, 120.0, traj_block_count(n, 2048)),
            (jnp.stack([
                linear_trajectory(120.0, 60.0, traj_block_count(n, 2048)),
                jnp.full((traj_block_count(n, 2048),), 25.0),
            ]) if args.crossing else jnp.asarray([25.0, 155.0])),
            cfg.mic_dist, cfg.fs,
        )
    else:
        scene = make_scene(
            speech_like(keys[0], n, cfg.fs, 150.0),
            jnp.stack([speech_like(keys[1], n, cfg.fs, 220.0),
                       speech_like(keys[2], n, cfg.fs, 120.0)]),
            90.0, jnp.asarray([40.0, 130.0]), cfg.mic_dist, cfg.fs,
        )
    mixture = np.asarray(scene["mixture"])

    model = None if args.model == "autosteer" else args.model
    if args.latency == "low" and model != "crn_causal":
        print("[demo] --latency low needs the causal mask net; using crn_causal")
        model = "crn_causal"
    zoom = AudioZoom(
        cfg=cfg, model=model,
        # camera ON the talker at zoom start in the crossing demo
        direction_deg=60.0 if args.crossing else 90.0,
        fov_deg=120.0 if args.track else 60.0, zoom=0.7,
        latency=args.latency, track=args.track, tracker=args.tracker,
    )

    out = []
    for start in range(0, n, args.blocksize):
        block = mixture[:, start : start + args.blocksize]
        out.append(zoom.push(block))
        if start == n // 2:  # camera pans mid-stream
            zoom.set_zoom(direction_deg=90.0, zoom=0.9)
            print(f"[demo] t={start / cfg.fs:.1f}s zoomed in (sigma={zoom.sigma:.1e})")
    enhanced = np.concatenate(out)

    m = min(len(enhanced), n)
    # High-latency stream output starts at input sample win/2 (the first
    # window's head is never emitted); the low-latency stream finalizes
    # from sample 0. Align before scoring.
    hop = 0 if args.latency == "low" else cfg.win_size // 2
    ref_t = np.asarray(scene["target_ref"])[hop : hop + m]
    ref_i = np.asarray(scene["interference_ref"])[hop : hop + m]
    _, sir = osinr_osir(jnp.asarray(enhanced[:m][: len(ref_t)]),
                        jnp.asarray(ref_t), jnp.asarray(ref_i))
    _, sir_in = osinr_osir(scene["mixture"][0], scene["target_ref"],
                           scene["interference_ref"])
    print(f"[demo] {args.model}: streamed {m / cfg.fs:.1f}s in "
          f"{len(range(0, n, args.blocksize))} blocks of {args.blocksize}")
    print(f"[demo] blind SIR {float(sir):.2f} dB (input {float(sir_in):.2f}, "
          f"improvement {float(sir) - float(sir_in):+.2f})")


if __name__ == "__main__":
    main()

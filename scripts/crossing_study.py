"""Crossing-trajectory study (TPU): two simultaneously moving talkers
whose bearings CROSS — the round-4 VERDICT tracking item.

Scene: 12 s anechoic, target glides 60 -> 120 deg while interferer 1
glides 120 -> 60 deg (bearings cross at 90 deg mid-stream) and
interferer 2 holds at 25 deg. The target is the QUIETER talker at the
crossing bait level (interferer gain 1.25x), so a tracker that breaks
the crossing tie on loudness swaps identity.

Methods (all blind, nano int8 mask net, FOV centered on the target's
START bearing — the camera aims at the talker when zoom starts):
  causal        forward-Viterbi filtering + aiming prior (round-3
                streaming default; position-only motion model)
  viterbi       offline MAP path (position-only)
  momentum      direction-state Viterbi (offline)
  momentum-c    direction-state forward filtering (streaming)
  oracle-steer  steered at the true trajectory (ceiling)

Reported per method: mean SIR improvement, trajectory RMS error, and
END-BEARING error (identity check: did the track end on the target's
120 deg side or swap to the interferer's 60 deg side?).

Run: timeout 900 python scripts/crossing_study.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.models.pretrained import load_bundled
from azoom.pipelines.tracked import tracked_autosteer_enhance
from azoom.sim.motion import (
    linear_trajectory,
    make_moving_scene,
    traj_block_count,
)
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04)
N = 192_000  # 12 s
FOV_C, FOV_W = 60.0, 120.0  # camera ON the talker at zoom start


def main():
    model, variables, fkind = load_bundled("tpufpu_nano", quant=True)
    B = traj_block_count(N, 2048)
    methods = {
        "causal": dict(tracker="causal"),
        "viterbi": dict(tracker="viterbi"),
        "momentum": dict(tracker="momentum"),
        "momentum-c": dict(tracker="momentum_causal"),
    }
    rows = []
    for seed in (7, 21, 42):
        sigs = speech_like_batch(jax.random.PRNGKey(seed), 3, N, CFG.fs)
        sigs = sigs.at[1].multiply(1.25)  # crossing interferer louder
        itraj = jnp.stack([
            linear_trajectory(120.0, 60.0, B),          # crossing glide
            jnp.full((B,), 25.0, jnp.float32),          # static
        ])
        sc = make_moving_scene(
            sigs[0], sigs[1:], linear_trajectory(60.0, 120.0, B),
            itraj, CFG.mic_dist, CFG.fs,
        )
        t_ref, i_ref = sc["target_ref"], sc["interference_ref"]
        _, sir_in = osinr_osir(sc["mixture"][0], t_ref, i_ref)

        def sir(out):
            return float(osinr_osir(out, t_ref, i_ref)[1] - sir_in)

        row = {"seed": seed, "sir_in": float(sir_in)}
        hop = CFG.win_size // 2
        n_chunks = None
        for name, kw in methods.items():
            out, th = tracked_autosteer_enhance(
                sc["mixture"], CFG, FOV_C, FOV_W,
                model=model, variables=variables, feature_kind=fkind,
                trans_sigma_deg=8.0, **kw,
            )
            th = np.asarray(th)
            n_chunks = th.shape[0]
            centers = (np.arange(n_chunks) * hop + CFG.win_size / 2) / N
            true = 60.0 + 60.0 * np.clip(centers, 0.0, 1.0)
            row[name] = sir(out)
            row[f"{name}_rms"] = float(np.sqrt(np.mean((th - true) ** 2)))
            row[f"{name}_end_err"] = float(np.abs(th[-1] - true[-1]))
        # steering ceiling at the true trajectory
        from azoom.pipelines.learned import learned_enhance
        from azoom.stream.chunker import chunk_signal, overlap_add_chunks

        centers = (np.arange(n_chunks) * hop + CFG.win_size / 2) / N
        true = jnp.asarray(60.0 + 60.0 * np.clip(centers, 0.0, 1.0),
                           jnp.float32)
        chunks, _ = chunk_signal(sc["mixture"], CFG.win_size, hop)
        proc = jax.vmap(
            lambda ch, th: learned_enhance(
                ch, model, variables, CFG, feature_kind=fkind, steer_deg=th
            )
        )(chunks, true)
        row["oracle-steer"] = sir(overlap_add_chunks(proc, hop, N))
        rows.append(row)
        print(row, flush=True)

    print(f"\nmean over {len(rows)} crossing scenes "
          f"(SIR imp dB / traj RMS deg / end-bearing err deg):")
    for name in list(methods) + ["oracle-steer"]:
        m = np.mean([r[name] for r in rows])
        if name == "oracle-steer":
            print(f"  {name:11s} {m:+.2f}")
        else:
            rms = np.mean([r[f"{name}_rms"] for r in rows])
            end = np.mean([r[f"{name}_end_err"] for r in rows])
            print(f"  {name:11s} {m:+.2f}  rms {rms:5.1f}  end {end:5.1f}")


if __name__ == "__main__":
    main()

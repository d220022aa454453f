"""Moving-talker tracked zoom under REVERB (TPU): does per-chunk steering
still pay when the room smears the DOA cues?

Scene: 12 s shoebox room (RT60~0.5, the reference's batch_run
configuration), target walking 55 -> 125 deg on a 1 m circle around the
4 cm array (full image-source render per trajectory block —
azoom.sim.motion.make_moving_room_scene), two static interferers (the
fixed reference position + one random). Methods:

  static-nano     autosteer_enhance + nano int8 (one whole-utterance DOA)
  tracked-causal  forward-Viterbi filter + aiming prior + nano int8
                  (the streaming default)
  oracle-steer    nano steered at the TRUE per-chunk trajectory (ceiling)

Run: timeout 1800 python scripts/moving_room_study.py [--max-order 15]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401  (compile cache)
from azoom.config import PipelineConfig, RoomConfig
from azoom.eval.projection import osinr_osir
from azoom.models.pretrained import load_bundled
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.pipelines.tracked import tracked_autosteer_enhance
from azoom.sim.motion import (
    linear_trajectory,
    make_moving_room_scene,
    traj_block_count,
)
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04)
ROOM = RoomConfig().with_mic_dist(0.04)
N = 192_000  # 12 s @ 16 kHz
FOV_C, FOV_W = 90.0, 100.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-order", type=int, default=15)
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 21, 42])
    args = ap.parse_args()

    model, variables, fkind = load_bundled("tpufpu_nano", quant=True)
    B = traj_block_count(N, 2048)
    rows = []
    for seed in args.seeds:
        sigs = speech_like_batch(jax.random.PRNGKey(seed), 3, N, CFG.fs)
        sc = make_moving_room_scene(
            jax.random.PRNGKey(seed + 1000), sigs[0], sigs[1:],
            linear_trajectory(55.0, 125.0, B), ROOM, CFG.fs,
            max_order=args.max_order,
        )
        t_ref, i_ref = sc["target_ref"], sc["interference_ref"]
        _, sir_in = osinr_osir(sc["mixture"][0], t_ref, i_ref)

        def sir(out):
            return float(osinr_osir(out, t_ref, i_ref)[1] - sir_in)

        out_s, th_s = autosteer_enhance(
            sc["mixture"], CFG, FOV_C, FOV_W,
            model=model, variables=variables, feature_kind=fkind,
        )
        out_t, th_t = tracked_autosteer_enhance(
            sc["mixture"], CFG, FOV_C, FOV_W, tracker="causal",
            model=model, variables=variables, feature_kind=fkind,
        )
        # Steering ceiling: true per-chunk bearing.
        n_chunks = th_t.shape[0]
        hop = CFG.win_size // 2
        centers = (jnp.arange(n_chunks) * hop + CFG.win_size / 2) / N
        true_traj = 55.0 + (125.0 - 55.0) * jnp.clip(centers, 0.0, 1.0)
        from azoom.pipelines.learned import learned_enhance
        from azoom.stream.chunker import chunk_signal, overlap_add_chunks

        chunks, _ = chunk_signal(sc["mixture"], CFG.win_size, hop)
        proc = jax.vmap(
            lambda ch, th: learned_enhance(
                ch, model, variables, CFG, feature_kind=fkind, steer_deg=th
            )
        )(chunks, true_traj)
        out_or = overlap_add_chunks(proc, hop, N)

        row = dict(
            seed=seed, sir_in=float(sir_in),
            static_nano=sir(out_s), tracked_causal=sir(out_t),
            oracle_steer=sir(out_or), static_doa=float(th_s),
            track=[round(float(x), 1) for x in np.asarray(th_t)],
        )
        rows.append(row)
        print(row, flush=True)

    print(f"\nmean SIR improvement (dB), {len(rows)} reverb scenes "
          f"(RT60~{ROOM.rt60_target}, order {args.max_order}):")
    for k in ("static_nano", "tracked_causal", "oracle_steer"):
        print(f"  {k:14s} {np.mean([r[k] for r in rows]):+.2f}")


if __name__ == "__main__":
    main()

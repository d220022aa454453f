"""Many concurrent live streams through one chip: AudioZoomServer demo.

Simulates a small media-server tick loop: S independent 2-mic capture
streams arrive in 1 s blocks; each tick runs stft -> mask net (reused
across the 50 % window overlap) -> MVDR -> iSTFT -> OLA for ALL streams
in one compiled program, moving one int16 PCM hop per stream each way.
Each stream has its own camera state (direction / zoom width), two run
with per-stream bearing tracking, and one leaves mid-session while a
new caller takes its slot.

Run (TPU or CPU):  python examples/live_server_demo.py
Multi-chip:        shard the stream axis by passing
                   mesh=jax.sharding.Mesh(jax.devices(), ("streams",))
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp
from azoom.config import PipelineConfig
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.stream.server import AudioZoomServer

S = 4
CFG = PipelineConfig(mic_dist=0.04, win_size=32_768)  # frame-aligned
HOP = CFG.win_size // 2
SECONDS = 6
ANGLES = [90.0, 60.0, 120.0, 75.0]


def main():
    n = SECONDS * CFG.fs
    streams = []
    for s in range(S):
        sigs = speech_like_batch(jax.random.PRNGKey(s), 3, n, CFG.fs)
        sc = make_scene(sigs[0], sigs[1:], ANGLES[s],
                        jnp.asarray([40.0, 150.0]), CFG.mic_dist, CFG.fs)
        streams.append(np.asarray(sc["mixture"]))
    blocks = np.stack(streams)  # (S, 2, n)

    srv = AudioZoomServer(
        S, cfg=CFG, model="tpufpu_nano", int8=True,
        mask_reuse=True,          # net runs only on [context + new] frames
        wire="int16",             # PCM both ways: 8x less tunnel traffic
        track=True, fov_deg=90.0,  # per-stream bearing tracking
    )
    for s in range(S):
        srv.set_zoom(s, direction_deg=ANGLES[s], zoom=0.6)

    got = np.zeros(S, int)
    for t in range(SECONDS):
        if t == 4:
            # stream 3's caller hangs up; a new one joins the same slot
            srv.detach(3)
            srv.attach(3, direction_deg=75.0, zoom=0.4)
            print("tick 4: slot 3 churned (detach + attach)")
        out = srv.push(blocks[:, :, t * CFG.fs:(t + 1) * CFG.fs])
        got += out.shape[1]
        print(f"tick {t}: {out.shape[1]:6d} samples/stream out "
              f"(int16), bearings {np.round(srv.bearings, 1)}")
    print(f"served {S} streams x {got[0] / CFG.fs:.1f} s enhanced audio")


if __name__ == "__main__":
    main()

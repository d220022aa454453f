"""Certify streaming mask-reuse THROUGH THE SERVER on blind scenes.

VERDICT r4 #1 'done' criterion: parity vs full-mask streaming at
<= 0.1 dB over >= 16 blind scenes — now measured on the PRODUCT path
(AudioZoomServer, nano int8, fast DSP, Pallas MVDR on the real chip),
not the offline feasibility harness. The stream axis carries one scene
per slot, so all 16 scenes ride one compiled program per config.

Configs:  full/f32  reuse/f32  (isolates the reuse delta)
          reuse/i16            (adds the wire quantization delta)

Run: timeout 1200 python scripts/server_reuse_parity.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

import azoom  # noqa: F401
import jax
import jax.numpy as jnp
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.stream.server import AudioZoomServer

CFG = PipelineConfig(mic_dist=0.04, win_size=32_768)
S = 16
HOP = CFG.win_size // 2
N = CFG.win_size + 8 * HOP  # ~10 s per stream


def main():
    mixes, tgts, itfs = [], [], []
    for s in range(S):
        sigs = speech_like_batch(jax.random.PRNGKey(500 + s), 3, N, CFG.fs)
        sc = make_scene(sigs[0], sigs[1:], 90.0,
                        jnp.asarray([40.0, 130.0]), CFG.mic_dist, CFG.fs)
        mixes.append(np.asarray(sc["mixture"]))
        tgts.append(np.asarray(sc["target_ref"]))
        itfs.append(np.asarray(sc["interference_ref"]))
    mixes = np.stack(mixes)

    def run(label, **kw):
        srv = AudioZoomServer(S, cfg=CFG, model="tpufpu_nano", int8=True,
                              dsp_precision="fast", **kw)
        out = srv.push(mixes)
        if out.dtype == np.int16:
            out = out.astype(np.float32) / 32767.0
        m = out.shape[1]
        imps = []
        for s in range(S):
            t = jnp.asarray(tgts[s][HOP:HOP + m])
            i = jnp.asarray(itfs[s][HOP:HOP + m])
            _, si = osinr_osir(jnp.asarray(mixes[s, 0, HOP:HOP + m]), t, i)
            _, so = osinr_osir(jnp.asarray(out[s]), t, i)
            imps.append(float(so - si))
        imps = np.asarray(imps)
        print(f"{label:10s}: +{imps.mean():.2f} ± "
              f"{imps.std()/np.sqrt(S):.2f} dB "
              f"(min {imps.min():+.2f})", flush=True)
        return imps

    full = run("full/f32")
    reuse = run("reuse/f32", mask_reuse=True)
    ri16 = run("reuse/i16", mask_reuse=True, wire="int16")
    print(f"reuse delta vs full: {reuse.mean()-full.mean():+.3f} dB "
          f"(per-scene max |d| {np.max(np.abs(reuse-full)):.3f})",
          flush=True)
    print(f"+i16 wire delta:     {ri16.mean()-reuse.mean():+.3f} dB",
          flush=True)


if __name__ == "__main__":
    main()

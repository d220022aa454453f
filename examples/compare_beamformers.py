"""Demo: every azoom beamformer on one scene, side by side.

    python examples/compare_beamformers.py [--reverb]

Builds a 3-source scene (target at 90 deg, interferers at 40/130), runs
each beamforming strategy, and prints a scoreboard (SIR improvement, STOI,
BSS-eval SDR). Runs anywhere JAX runs; no model checkpoint needed except
for the learned rows (bundled artifacts used when present).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

# This environment's TPU plugin re-registers itself over JAX_PLATFORMS; the
# config update is required to actually select CPU (see tests/conftest.py).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from azoom.beam.gev import gev_beamform, max_snr_fov_beamform
from azoom.config import PipelineConfig
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.eval.bss import bss_eval_sources
from azoom.eval.projection import osinr_osir
from azoom.eval.stoi import stoi
from azoom.masks.geometric import hard_geometric_noise_mask
from azoom.masks.oracle import ibm_noise_mask, ibm_target_mask
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.pipelines.oracle import heuristic_enhance, oracle_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.scene import SceneSpec, generate_scene
from azoom.sim.signals import speech_like_batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reverb", action="store_true")
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--mics", type=int, default=2,
                   help="uniform linear array size (every beamformer is "
                        "M-general; try --mics 4 to watch the extra "
                        "spatial nulls pay)")
    args = p.parse_args()

    n = int(args.seconds * 16_000)
    if args.reverb:
        from azoom.config import RoomConfig

        cfg = PipelineConfig(mic_dist=0.08, sigma=1e-6, n_mics=args.mics)
        sc = generate_scene(
            jax.random.PRNGKey(0),
            SceneSpec(reverb=True, n_interferers=2, duration_s=args.seconds),
            room=RoomConfig().with_linear_array(args.mics, 0.08),
            max_order=6,
        )
    else:
        cfg = PipelineConfig(mic_dist=0.04, n_mics=args.mics)
        sigs = speech_like_batch(jax.random.PRNGKey(0), 3, n, cfg.fs)
        sc = make_scene(
            sigs[0], sigs[1:], 90.0, jnp.asarray([40.0, 130.0]),
            cfg.mic_dist, cfg.fs, n_mics=args.mics,
        )

    mix, tgt, itf = sc["mixture"], sc["target_ref"], sc["interference_ref"]
    Y = stft(mix, cfg.n_fft, cfg.hop)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    S_t, S_i = stft(tgt, cfg.n_fft, cfg.hop), stft(itf, cfg.n_fft, cfg.hop)
    tgt_mask = ibm_target_mask(S_t, S_i)

    candidates = {
        "oracle MVDR (binary)": oracle_enhance(mix, tgt, itf, cfg),
        "oracle MVDR (IRM)": oracle_enhance(mix, tgt, itf, cfg, post_filter="irm"),
        "oracle GEV": istft(gev_beamform(Y, tgt_mask) * tgt_mask,
                            cfg.n_fft, cfg.hop, length=n),
        "blind IPD heuristic": heuristic_enhance(mix, cfg),
        "blind autosteer": autosteer_enhance(mix, cfg, 90.0, 60.0)[0],
        "blind maxSNR FOV 10deg": istft(
            max_snr_fov_beamform(Y, hard_geometric_noise_mask(Y), freqs,
                                 90.0, 10.0, cfg.mic_dist, cfg.c, 1e-6),
            cfg.n_fft, cfg.hop, length=n),
    }
    from azoom.models.pretrained import load_bundled
    from azoom.pipelines.learned import learned_enhance

    try:
        model, variables, kind = load_bundled("fpu")
        candidates["learned FPU + MVDR"] = learned_enhance(
            mix, model, variables, cfg, feature_kind=kind
        )
        candidates["learned FPU + RMVB"] = learned_enhance(
            mix, model, variables, cfg, beamformer="rmvb", feature_kind=kind
        )
        candidates["learned FPU + WPD"] = learned_enhance(
            mix, model, variables, cfg, beamformer="wpd", feature_kind=kind
        )
        candidates["learned FPU + RTF (geo-free)"] = learned_enhance(
            mix, model, variables, cfg, beamformer="rtf", feature_kind=kind
        )
    except FileNotFoundError:
        pass
    try:
        tq, vq, kq = load_bundled("tpufpu", quant=True)
        candidates["TPUFPU int8 + MVDR"] = learned_enhance(
            mix, tq, vq, cfg, feature_kind=kq
        )
    except FileNotFoundError:
        pass

    _, sir_in = osinr_osir(mix[0], tgt, itf)
    refs = jnp.stack([tgt, itf])
    print(f"\ninput SIR: {float(sir_in):6.2f} dB"
          f"  ({'reverb' if args.reverb else 'anechoic'} scene)\n")
    print(f"{'method':28s} {'dSIR':>8s} {'STOI':>7s} {'BSS-SDR':>8s}")
    for name, out in candidates.items():
        _, sir = osinr_osir(out, tgt, itf)
        st = stoi(tgt, out, cfg.fs)
        bss = bss_eval_sources(refs, out, filter_len=256)
        print(f"{name:28s} {float(sir - sir_in):+8.2f} {float(st):7.3f} "
              f"{float(bss['sdr']):8.2f}")


if __name__ == "__main__":
    main()

"""Batch sweep driver: ``python -m azoom.cli.batch --n 50 --interferers 2``.

Rebuild of Final_pipeline/batch_run.py:12-58 with two execution modes:

  * ``--per-run`` — the reference's serial loop (sim -> inf -> eval per
    scene) with its try/except-continue fault tolerance (batch_run.py:47-49)
    and the same WAV/report/CSV artifacts per run.
  * default vectorized — the TPU-native path: all scenes are one sharded
    array program (azoom.parallel.sweep); thousands of mixtures per step,
    metrics aggregated on device, one CSV row per scene at the end.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(prog="azoom.batch", description="Batch sweep")
    p.add_argument("--n", type=int, default=10, help="number of runs")
    p.add_argument("--interferers", type=int, default=2)
    p.add_argument("--start", type=int, default=0, help="start index (resume)")
    p.add_argument("--prefix", default="batch_test")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--per-run", action="store_true",
                   help="serial per-scene file pipeline (reference semantics)")
    p.add_argument("--data-root", default="data")
    p.add_argument("--beamformer", default="oracle",
                   choices=["oracle", "mvdr", "hard_null", "rmvb", "wpd",
                            "rtf", "gev"])
    p.add_argument("--model", default="fpu",
                   choices=["fpu", "deepfpu", "tpufpu", "tpufpu_slim",
                            "tpufpu_nano"],
                   help="mask net for learned beamformers (both modes); "
                        "tpufpu = MXU-shaped flagship")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--int8", action="store_true",
                   help="serve the mask net on the int8-MXU path "
                        "(same artifacts, ~1.5x faster on v5e)")
    p.add_argument("--no-reverb", action="store_true")
    p.add_argument("--interferer-kind", default="speech",
                   choices=["speech", "babble", "music", "noise"],
                   help="interference class (the reference's --dataset "
                        "musan axis): babble = summed talkers, music = "
                        "harmonic texture, noise = 1/f texture")
    p.add_argument("--fixed-angles", action="store_true",
                   help="anechoic scenes use the fixed 40/130 deg geometry "
                        "instead of randomized interferer angles")
    p.add_argument("--dsp-precision", default="exact",
                   choices=["exact", "fast"],
                   help="STFT/iSTFT matmul-DFT precision in vectorized "
                        "learned sweeps; 'fast' = single-pass bf16 (1.32x "
                        "the serving step, measured zero blind-SIR cost "
                        "— the benchmarked flagship configuration)")
    p.add_argument("--steer-error", type=float, default=0.0,
                   help="deliberate look-direction error (deg) applied to "
                        "the enhancement stack in vectorized learned sweeps "
                        "— models camera pointing error; scenes keep the "
                        "true target angle")
    p.add_argument("--hrnr", action="store_true",
                   help="harmonic-regeneration post-filter in vectorized "
                        "learned sweeps (azoom.beam.postfilter; reference "
                        "roadmap TODO:9)")
    p.add_argument("--duration", type=float, default=2.0)
    p.add_argument("--snr", type=float, default=50.0,
                   help="AWGN sensor-noise SNR in dB (the reference's "
                        "world.py --snr axis; its batch driver pins 50 = "
                        "effectively noiseless)")
    p.add_argument("--mic-dist", type=float, default=0.04,
                   help="mic spacing in meters for vectorized sweeps; "
                        "bundled nets geometry-adapt automatically when "
                        "the array is smaller than their 4 cm training "
                        "spacing (--no-geo-adapt disables)")
    p.add_argument("--mics", type=int, default=2,
                   help="mic count for vectorized sweeps (linear array at "
                        "--mic-dist spacing). The reference is hard-wired "
                        "to 2; M>2 buys M-1 spatial nulls (oracle/mvdr/wpd "
                        "beamformers; see RESULTS.md DoF study)")
    p.add_argument("--geometry", default=None,
                   help="explicit mic coordinates in meters ('x,y;x,y;...')"
                        " — overrides --mics/--mic-dist; the simulated "
                        "room places the real array and steering uses its "
                        "true positions (round-4 arbitrary-geometry axis)")
    p.add_argument("--no-geo-adapt", action="store_true")
    p.add_argument("--max-order", type=int, default=None,
                   help="image-source order for per-run simulation")
    p.add_argument("--chunk-scenes", type=int, default=64,
                   help="scenes per compiled step in vectorized mode; the "
                        "same XLA program is re-invoked with fresh keys, so "
                        "a 10k-scene campaign compiles once and streams")
    p.add_argument("--no-pesq", action="store_true",
                   help="skip host-side PESQ scoring in vectorized mode "
                        "(saves the waveform fetch + ~0.1 s/scene on host)")
    return p


def _load_sweep_model(args, cfg):
    """(model, variables, feature_kind, geo_dist) for the vectorized
    learned sweep; geo_dist is the geometry-adaptation ``train_mic_dist``
    (bundled artifacts on arrays smaller than their training spacing).

    Defaults to the bundled artifacts (the reverb-trained FPU for reverb
    campaigns); --ckpt accepts an int8 .npz artifact or an orbax dir.
    """
    feature_kind = "logmag_ipd" if args.model == "fpu" else "physics"
    quant = getattr(args, "int8", False)
    if args.ckpt:
        import jax

        from azoom.models.unet import DeepFPU, FreqPreservingUNet
        from azoom.train.loop import create_state

        if args.model == "fpu":
            model = FreqPreservingUNet(quant=quant)
        elif args.model == "tpufpu":
            from azoom.models.unet import TPUFPU

            model = TPUFPU(base=64, fold=4, quant=quant)
        elif args.model == "tpufpu_slim":
            from azoom.models.unet import TPUFPU

            model = TPUFPU(base=64, fold=4, quant=quant, bneck=4)
        elif args.model == "tpufpu_nano":
            from azoom.models.unet import TPUFPU

            model = TPUFPU(
                base=64, fold=4, quant=quant, bneck=4, dec_div=2, enc_div=2
            )
        else:
            model = DeepFPU(quant=quant)
        ckpt = Path(args.ckpt)
        if ckpt.suffix == ".npz":
            from azoom.models.quantize import load_quantized

            print(f"[BATCH] using quantized artifact {ckpt}")
            return model, load_quantized(ckpt), feature_kind, None
        from azoom.train.loop import restore_checkpoint

        n_ch = 2 if feature_kind == "logmag_ipd" else 4
        state = create_state(
            model, jax.random.PRNGKey(0), (1, cfg.n_freqs, 64, n_ch)
        )
        state, step = restore_checkpoint(ckpt, state)
        print(f"[BATCH] using checkpoint step {step} from {ckpt}")
        return (
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            feature_kind,
            None,
        )
    from azoom.models.pretrained import geo_adapt_dist, load_bundled

    # For plain --model fpu, reverb campaigns get the reverb-trained twin.
    name = args.model
    if name == "fpu" and not args.no_reverb:
        name = "fpu_reverb"
    # Explicit geometry: adaptation keys on the FIRST pair's effective
    # baseline (the features' IPD source under mic_positions).
    d_eff = cfg.mic_dist
    if cfg.mic_positions is not None:
        import numpy as _np

        p = _np.asarray(cfg.mic_positions, _np.float64)
        if p.ndim == 1:
            p = p[:, None]
        d_eff = float(_np.linalg.norm(p[0][:2] - p[1][:2]))
    geo = (
        None if getattr(args, "no_geo_adapt", False)
        else geo_adapt_dist(name, d_eff)
    )
    tag = " (int8-MXU serving)" if quant else ""
    tag += f" (geometry-adapted to {d_eff*100:.1f} cm)" if geo else ""
    print(f"[BATCH] using bundled {name} artifact{tag}")
    model, variables, feature_kind = load_bundled(name, quant=quant)
    return model, variables, feature_kind, geo


def run_vectorized(args):
    import jax

    from azoom.config import DEFAULT, ROOM_DEFAULT
    from azoom.eval.reports import append_to_csv
    from azoom.parallel.mesh import make_mesh
    from azoom.parallel.sweep import learned_sweep, oracle_sweep, sweep_summary

    # Every vectorized-mode beamformer (oracle/mvdr/hard_null/rmvb/wpd/
    # rtf) is M-mic-general: 2-mic closed forms stay the M=2 hot path,
    # linalgmm's unrolled Cholesky/Jacobi serve M>2.
    cfg = DEFAULT.replace(mic_dist=args.mic_dist, n_mics=args.mics)
    if getattr(args, "geometry", None):
        from azoom.config import parse_geometry

        cfg = cfg.with_geometry(parse_geometry(args.geometry))
    # Keep the simulated room's physical array consistent with the
    # enhancement config (round-3 fix: the room previously kept its 8 cm
    # default pair whatever --mic-dist said). with_linear_array(2, d)
    # reproduces the historical with_mic_dist(d) pair exactly. (With
    # --geometry, _scene_from_key overrides this room with the explicit
    # array via with_array_positions.)
    room = ROOM_DEFAULT.with_linear_array(args.mics, args.mic_dist)
    reverb = not args.no_reverb
    n_dev = len(jax.devices())
    n = args.n + (-args.n) % n_dev  # round up to a multiple of devices
    key = jax.random.PRNGKey(args.seed)
    n_samples = int(args.duration * cfg.fs)
    common = dict(
        n_samples=n_samples,
        with_stoi=True,
        n_interferers=args.interferers,
        reverb=reverb,
        randomize=not args.fixed_angles,
        with_waveforms=not args.no_pesq,
        interferer_kind=args.interferer_kind,
        room=room,
        snr_db=args.snr,
    )
    if args.beamformer == "oracle":
        if args.steer_error:
            raise SystemExit(
                "--steer-error applies to learned beamformers "
                "(mvdr/hard_null/rmvb), not the oracle sweep"
            )
        sweep_fn, sweep_args = oracle_sweep, (cfg,)
    elif args.beamformer in ("mvdr", "hard_null", "rmvb", "wpd", "rtf"):
        model, variables, feature_kind, geo = _load_sweep_model(args, cfg)
        sweep_fn, sweep_args = learned_sweep, (cfg, model, variables)
        common.update(
            beamformer=args.beamformer, feature_kind=feature_kind,
            steer_error_deg=args.steer_error, train_mic_dist=geo,
            dsp_precision=args.dsp_precision,
            harmonic_regen=args.hrnr,
        )
    else:
        raise SystemExit(
            f"beamformer {args.beamformer!r} is not available in vectorized "
            "mode; use --per-run"
        )
    chunk = max(n_dev, min(args.chunk_scenes, n))
    chunk -= chunk % n_dev
    print(
        f"[BATCH] vectorized sweep: {n} scenes over {n_dev} device(s) — "
        f"{args.beamformer}, {args.interferers} interferer(s), "
        f"{'reverb' if reverb else 'anechoic'}, {chunk} scenes/step"
    )

    import numpy as np

    # One compiled program per chunk size (almost always exactly one):
    # sharded_sweep wraps the sweep in a fresh jax.jit whose cache would
    # be empty on every call, so a streamed multi-device campaign would
    # re-trace each chunk without this memo.
    mesh = make_mesh() if n_dev > 1 else None
    jitted = {}

    def run_chunk(k, m):
        if mesh is None:
            return sweep_fn(k, *sweep_args, n_scenes=m, **common)
        if m % n_dev != 0:
            raise ValueError(f"chunk {m} must divide over {n_dev} devices")
        fn = jitted.get(m)
        if fn is None:
            from jax.sharding import NamedSharding, PartitionSpec

            shard = NamedSharding(mesh, PartitionSpec("data"))
            fn = jax.jit(
                lambda kk: sweep_fn(kk, *sweep_args, n_scenes=m, **common),
                out_shardings=shard,
            )
            jitted[m] = fn
        with mesh:
            return fn(k)

    # Host-side perceptual scoring per streamed chunk: waveforms are
    # fetched, PESQ'd (azoom.eval.pesq_bridge — ITU lib or the native
    # P.862 implementation), and dropped before the next chunk so a
    # 10k-scene campaign never holds more than one chunk of audio.
    parts = []
    pesq_nb_all, pesq_wb_all = [], []
    done = 0
    step = 0
    while done < n:
        m = min(chunk, n - done)
        m += (-m) % n_dev
        p = run_chunk(jax.random.fold_in(key, step), m)
        if not args.no_pesq:
            from azoom.eval.pesq_bridge import pesq_scores

            enh = np.asarray(p.pop("enhanced"))
            tgt = np.asarray(p.pop("target"))
            for j in range(enh.shape[0]):
                nb, wb = pesq_scores(tgt[j], enh[j], cfg.fs)
                pesq_nb_all.append(nb)
                pesq_wb_all.append(wb)
        parts.append(p)
        done += m
        step += 1
    res = {
        name: np.concatenate([np.asarray(p[name]) for p in parts])[:n]
        for name in parts[0]
    }

    csv_path = Path(args.data_root) / "results" / "batch_metrics.csv"
    for i in range(args.n):
        m = {
            "sir_b": float(res["sir_in"][i]),
            "sir_s": float(res["sir_out"][i]),
            "imp": float(res["sir_imp"][i]),
            "sinr_b": float(res["sinr_in"][i]),
            "sinr_s": float(res["sinr_out"][i]),
            "stoi": float(res["stoi"][i]),
            "pesq_wb": pesq_wb_all[i] if pesq_wb_all else None,
            "pesq_nb": pesq_nb_all[i] if pesq_nb_all else None,
        }
        append_to_csv(csv_path, f"{args.prefix}_{args.start + i:03d}", m)
    summ = sweep_summary(res)
    if pesq_wb_all:
        wb_arr = np.asarray([v for v in pesq_wb_all[: args.n] if v is not None])
        nb_arr = np.asarray([v for v in pesq_nb_all[: args.n] if v is not None])
        if wb_arr.size:
            print(
                f"[BATCH] pesq_wb: mean {wb_arr.mean():.3f} "
                f"[{wb_arr.min():.3f}, {wb_arr.max():.3f}]  "
                f"pesq_nb: mean {nb_arr.mean():.3f}"
            )
    print(
        f"[BATCH] sir_imp: mean {summ['sir_imp']['mean']:.2f} dB, "
        f"std {summ['sir_imp']['std']:.2f}, n_failed {summ['sir_imp']['n_failed']}"
    )
    print(f"[BATCH] metrics appended to {csv_path}")
    return summ


def run_per_run(args):
    from azoom.cli.run import build_parser as run_parser, do_eval, do_inf, do_sim
    from azoom.config import PathsConfig

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda x: x  # noqa: E731

    paths = PathsConfig(root=Path(args.data_root))
    ok = failed = 0
    for i in tqdm(range(args.start, args.start + args.n)):
        name = f"{args.prefix}_{i:03d}"
        run_args = run_parser().parse_args(
            ["full", "--name", name, "--interferers", str(args.interferers),
             "--seed", str(args.seed + i), "--duration", str(args.duration),
             "--beamformer", args.beamformer, "--data-root", args.data_root]
            + (["--no-reverb"] if args.no_reverb else [])
            + ["--interferer-kind", args.interferer_kind]
            + ["--snr", str(args.snr)]
            + ["--mic-dist", str(args.mic_dist)]
            + ["--mics", str(args.mics)]
            + (["--max-order", str(args.max_order)] if args.max_order is not None else [])
            + (["--ckpt", args.ckpt] if args.ckpt else [])
            + (["--int8"] if args.int8 else [])
            + (["--no-geo-adapt"] if args.no_geo_adapt else [])
            + ["--model", args.model]  # run.py derives features from it
        )
        try:
            do_sim(run_args, paths)
            do_inf(run_args, paths)
            do_eval(run_args, paths)
            ok += 1
        except Exception as e:  # noqa: BLE001 - batch_run.py:47-49 semantics
            print(f"[BATCH] run {name} FAILED: {e}; continuing")
            failed += 1
    print(f"[BATCH] done: {ok} ok, {failed} failed")


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.per_run:
        if args.steer_error:
            raise SystemExit("--steer-error is a vectorized-mode option")
        run_per_run(args)
    else:
        run_vectorized(args)


if __name__ == "__main__":
    main()

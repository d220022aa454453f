"""Single-run CLI: ``python -m azoom.cli.run sim|inf|eval|full --name X``.

Rebuild of Final_pipeline/run.py:5-61 with the same mode set and directory
convention (data/simulated/{name} -> data/results/{name}_results,
run.py:24-26). Additions over the reference: ``--beamformer`` selects
mvdr | hard_null | oracle | gev (oracle needs no trained model — it uses
the simulation's answer-key stems, the gen-1 scientific path), ``--angle``
steers the zoom direction, ``--zoom`` maps a 0..1 zoom level onto the
diagonal-loading beamwidth control.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from azoom.config import DEFAULT, PathsConfig, RoomConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="azoom.run", description="Audio-Zoom single-run pipeline"
    )
    p.add_argument("mode", choices=["sim", "inf", "eval", "full"])
    p.add_argument("--name", default="test_run", help="Run ID")
    p.add_argument("--interferers", type=int, default=1)
    p.add_argument("--interferer-kind", default="speech",
                   choices=["speech", "babble", "music", "noise"],
                   help="interference class (reference --dataset musan axis)")
    p.add_argument("--no-reverb", action="store_true")
    p.add_argument("--snr", type=float, default=50.0)
    p.add_argument("--duration", type=float, default=4.0)
    p.add_argument("--max-order", type=int, default=None,
                   help="image-source order override (default RoomConfig)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--beamformer", default="oracle",
        choices=["oracle", "mvdr", "hard_null", "rmvb", "wpd", "rtf", "gev",
                 "maxsnr_fov", "autosteer", "online"],
        help="oracle = answer-key IBM (no model); gev = oracle-mask GEV; "
             "maxsnr_fov = blind FOV-constrained max-SNR; autosteer = blind "
             "localize-in-FOV + steered MVDR; online = causal CRN + "
             "recursive MVDR (32 ms latency); mvdr/hard_null/rmvb use the "
             "learned mask (--ckpt or bundled artifact; rmvb = robust "
             "Capon, tolerant of approximate look directions; rtf = "
             "geometry-free MVDR steered by the measured relative "
             "transfer function instead of the plane-wave model)",
    )
    p.add_argument("--fov", type=float, default=None,
                   help="field-of-view width (deg); default 10 for "
                        "maxsnr_fov, 60 for autosteer")
    p.add_argument("--track", action="store_true",
                   help="follow a MOVING talker: per-chunk DOA + Viterbi "
                        "bearing track steers every 2 s window at its own "
                        "estimate (azoom.pipelines.tracked); composes with "
                        "--autosteer/--model or the heuristic autosteer")
    p.add_argument("--autosteer", action="store_true",
                   help="with mvdr/hard_null/rmvb: refine the look "
                        "direction with the blind DOA histogram inside "
                        "the camera FOV (--angle +/- --fov/2) before "
                        "steering the mask net — the fully blind "
                        "camera-driven product path")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir (trained model)")
    p.add_argument("--int8", action="store_true",
                   help="serve the mask net on the int8-MXU path (QConv; "
                        "same checkpoint, ~1.5x faster on v5e, blind SIR "
                        "within 0.2 dB of float — see RESULTS.md)")
    p.add_argument("--model", default="fpu",
                   choices=["fpu", "deepfpu", "tpufpu", "tpufpu_slim",
                            "tpufpu_nano"],
                   help="mask net; tpufpu = the MXU-shaped flagship "
                        "(physics features, 2.25x deepfpu's speed); "
                        "tpufpu_slim = bneck=4 serving variant (~1.3x "
                        "tpufpu at equal-or-better held-out quality); "
                        "tpufpu_nano = distilled half-width serving "
                        "flagship (1.76x slim, same quality)")
    p.add_argument("--features", default=None,
                   choices=["logmag_ipd", "physics"],
                   help="feature kind; defaults to what --model was "
                        "trained on (physics for deepfpu/tpufpu)")
    p.add_argument("--no-geo-adapt", action="store_true",
                   help="disable inference-time geometry adaptation "
                        "(IPD rescaling to the artifact's training "
                        "spacing when --mic-dist is smaller than it)")
    p.add_argument("--mic-dist", type=float, default=None,
                   help="mic spacing in meters (default from config)")
    p.add_argument("--geometry", default=None,
                   help="explicit mic coordinates in meters, e.g. a 4-mic "
                        "rectangle '-0.015,-0.01;0.015,-0.01;-0.015,0.01;"
                        "0.015,0.01' — overrides --mics/--mic-dist for "
                        "sim, steering, and localization (round-4 "
                        "arbitrary-geometry axis; the reference is "
                        "hard-wired to scalar spacing, masked_mvdr.py:22-35)")
    p.add_argument("--mics", type=int, default=2,
                   help="mic count (sim: simulate an M-element linear "
                        "array at --mic-dist spacing; inf adapts to the "
                        "mixture WAV's channel count automatically). The "
                        "reference is hard-wired to 2; M>2 buys M-1 "
                        "spatial nulls on every beamformer "
                        "(see RESULTS.md DoF study)")
    p.add_argument("--nulls", type=int, default=1,
                   help="hard_null at M>2: how many principal "
                        "interference eigenvectors to null (clamped to "
                        "M-1; set to the expected interferer count)")
    p.add_argument("--angle", type=float, default=90.0, help="zoom steering angle (deg)")
    p.add_argument("--sigma", type=float, default=None, help="diagonal loading")
    p.add_argument("--zoom", type=float, default=None,
                   help="zoom level 0..1 (overrides --sigma via zoom_to_sigma)")
    p.add_argument("--data-root", default="data")
    p.add_argument("--history", default=None,
                   help="append the eval report to this history file "
                        "(scripts/eval.py:216-223 behavior)")
    p.add_argument("--timed", action="store_true",
                   help="print per-stage timing for inference "
                        "(resnet_model_mvdr/inference.py:270-274 behavior)")
    p.add_argument("--wpe", action="store_true",
                   help="WPE-dereverberate the mixture before enhancement "
                        "(resnet_model_mvdr/inference.py:282 behavior)")
    p.add_argument("--hrnr", action="store_true",
                   help="harmonic-regeneration post-filter on the learned "
                        "paths: re-open mask-suppressed target-harmonic "
                        "bins from rectified stage-1 evidence "
                        "(azoom.beam.postfilter; reference roadmap TODO:9)")
    return p


def _config(args):
    cfg = DEFAULT.replace(angle_target_deg=args.angle)
    if getattr(args, "mic_dist", None) is not None:
        cfg = cfg.replace(mic_dist=args.mic_dist)
    if getattr(args, "geometry", None):
        from azoom.config import parse_geometry

        cfg = cfg.with_geometry(parse_geometry(args.geometry))
    if args.zoom is not None:
        from azoom.beam.zoom import zoom_to_sigma

        cfg = cfg.replace(sigma=float(zoom_to_sigma(args.zoom)))
    elif args.sigma is not None:
        cfg = cfg.replace(sigma=args.sigma)
    return cfg


def do_sim(args, paths: PathsConfig) -> Path:
    import jax

    from azoom.io.wav import write_wav
    from azoom.sim.scene import SceneSpec, generate_scene
    from azoom.utils.host import to_numpy

    spec = SceneSpec(
        reverb=not args.no_reverb,
        n_interferers=args.interferers,
        snr_db=args.snr,
        duration_s=args.duration,
        interferer_kind=args.interferer_kind,
    )
    print(f"[SIM] Generating scene '{args.name}' ({spec})...")
    room = RoomConfig()
    if getattr(args, "geometry", None):
        from azoom.config import parse_geometry

        room = room.with_array_positions(parse_geometry(args.geometry))
    elif args.mic_dist is not None or args.mics != 2:
        # Sim matches enhancement: re-space (and optionally extend) the
        # simulated array. with_linear_array(2, d) == with_mic_dist(d).
        (x0, _, _), (x1, _, _) = room.mic_locs[0], room.mic_locs[1]
        d = args.mic_dist if args.mic_dist is not None else abs(x1 - x0)
        room = room.with_linear_array(args.mics, d)
    sc = generate_scene(
        jax.random.PRNGKey(args.seed), spec, room, max_order=args.max_order
    )
    outdir = paths.run_sim_dir(args.name)
    fs = spec.fs
    write_wav(outdir / "mixture.wav", to_numpy(sc["mixture"]).T, fs)
    write_wav(outdir / "target.wav", to_numpy(sc["target_stereo"]).T, fs)
    write_wav(outdir / "interference.wav", to_numpy(sc["interference_stereo"]).T, fs)
    # Per-run provenance record (world.py:265-268 info.txt behavior).
    (outdir / "info.txt").write_text(
        f"run: {args.name}\nreverb: {spec.reverb}\n"
        f"n_interferers: {spec.n_interferers}\n"
        f"interferer_kind: {spec.interferer_kind}\nsnr_db: {spec.snr_db}\n"
        f"duration_s: {spec.duration_s}\nfs: {spec.fs}\nseed: {args.seed}\n"
    )
    print(f"[SIM] Files saved to: {outdir}")
    return outdir


def model_features(args) -> str:
    """The feature kind the selected model was trained on; --features only
    overrides it explicitly (so `--model tpufpu` alone serves the bundled
    physics-feature flagship instead of silently falling back to
    untrained weights — a round-2 review finding)."""
    if args.features is not None:
        return args.features
    return ("logmag_ipd" if args.model == "fpu" else "physics")


def _load_model_variables(args, cfg):
    """Returns (model, variables, geo_dist): geo_dist is the training
    spacing to pass to the pipelines as ``train_mic_dist`` (geometry
    adaptation), or None."""
    import jax

    from azoom.models.unet import DeepFPU, FreqPreservingUNet, TPUFPU
    from azoom.train.loop import create_state

    quant = getattr(args, "int8", False)
    features = model_features(args)
    if not args.ckpt:
        # No checkpoint: serve the bundled artifact when the requested
        # features match its training features (one source of truth:
        # azoom.models.pretrained.load_bundled).
        from azoom.models.pretrained import (
            bundled_artifact_path,
            geo_adapt_dist,
            load_bundled,
        )

        if bundled_artifact_path(args.model) is not None:
            model, variables, bundled_features = load_bundled(
                args.model, quant=quant
            )
            if bundled_features == features:
                geo = (
                    None if getattr(args, "no_geo_adapt", False)
                    else geo_adapt_dist(args.model, cfg.mic_dist)
                )
                print(f"[INF] Using bundled pretrained artifact "
                      f"{bundled_artifact_path(args.model).name}"
                      + (" (int8-MXU serving)" if quant else "")
                      + (f" (geometry-adapted {geo*100:.0f} cm -> "
                         f"{cfg.mic_dist*100:.0f} cm)" if geo else ""))
                return model, variables, geo
        print("[INF] WARNING: no --ckpt given; using untrained weights")

    if args.model == "fpu":
        model = FreqPreservingUNet(quant=quant)
    elif args.model == "tpufpu":
        model = TPUFPU(base=64, fold=4, quant=quant)
    elif args.model == "tpufpu_slim":
        model = TPUFPU(base=64, fold=4, quant=quant, bneck=4)
    elif args.model == "tpufpu_nano":
        model = TPUFPU(base=64, fold=4, quant=quant, bneck=4, dec_div=2,
                       enc_div=2)
    else:
        model = DeepFPU(quant=quant)
    n_ch = 2 if features == "logmag_ipd" else 4
    state = create_state(
        model, jax.random.PRNGKey(0), (1, cfg.n_freqs, 64, n_ch)
    )
    if args.ckpt:
        ckpt = Path(args.ckpt)
        if ckpt.suffix == ".npz":  # quantized deployment artifact
            from azoom.models.quantize import load_quantized

            variables = load_quantized(ckpt)
            print(f"[INF] Loaded quantized artifact {ckpt}")
            return model, variables, None
        from azoom.train.loop import restore_checkpoint

        state, step = restore_checkpoint(ckpt, state)
        print(f"[INF] Loaded checkpoint step {step} from {args.ckpt}")
    return model, {"params": state.params, "batch_stats": state.batch_stats}, None


def do_inf(args, paths: PathsConfig) -> Path:
    import jax.numpy as jnp

    from azoom.io.wav import read_wav, write_wav
    from azoom.utils.host import to_numpy

    cfg = _config(args)
    sim_dir = paths.run_sim_dir(args.name)
    res_dir = paths.run_results_dir(args.name)
    mix, fs = read_wav(sim_dir / "mixture.wav")
    mixture = jnp.asarray(mix.T)  # (M, n)
    if mixture.shape[0] != cfg.n_mics:
        # M-mic generalization: follow the recording's channel count
        # (the sim stage wrote an --mics-element array). Every beamformer
        # is M-general (2-mic closed forms remain the M=2 hot path;
        # linalgmm's unrolled Cholesky/Jacobi serve M>2).
        cfg = cfg.replace(n_mics=int(mixture.shape[0]))
    if args.wpe:
        from azoom.wpe.dereverb import wpe_dereverb

        print("[INF] WPE dereverberation preprocessing...")
        mixture = wpe_dereverb(mixture, cfg)
    print(f"[INF] Enhancing '{args.name}' with {args.beamformer} beamformer...")

    timer = None
    if args.timed:
        from azoom.utils.profiling import stage_timer

        timer = stage_timer()

    if args.beamformer == "oracle":
        from azoom.pipelines.oracle import oracle_enhance

        tgt, _ = read_wav(sim_dir / "target.wav")
        itf, _ = read_wav(sim_dir / "interference.wav")
        out = oracle_enhance(
            mixture,
            jnp.asarray(tgt[:, 0] if tgt.ndim > 1 else tgt),
            jnp.asarray(itf[:, 0] if itf.ndim > 1 else itf),
            cfg,
            post_filter="irm",
        )
    elif args.beamformer == "gev":
        from azoom.dsp.stft import istft, stft
        from azoom.beam.gev import gev_beamform
        from azoom.masks.oracle import ibm_target_mask

        tgt, _ = read_wav(sim_dir / "target.wav")
        itf, _ = read_wav(sim_dir / "interference.wav")
        Y = stft(mixture, cfg.n_fft, cfg.hop)
        S_t = stft(jnp.asarray(tgt[:, 0] if tgt.ndim > 1 else tgt), cfg.n_fft, cfg.hop)
        S_i = stft(jnp.asarray(itf[:, 0] if itf.ndim > 1 else itf), cfg.n_fft, cfg.hop)
        m = ibm_target_mask(S_t, S_i)
        out = istft(gev_beamform(Y, m) * m, cfg.n_fft, cfg.hop,
                    length=mixture.shape[-1])
    elif args.beamformer == "autosteer":
        if args.track:
            from azoom.pipelines.tracked import tracked_autosteer_enhance

            out, theta = tracked_autosteer_enhance(
                mixture, cfg, fov_center_deg=args.angle,
                fov_width_deg=args.fov if args.fov is not None else 60.0,
            )
            track = ", ".join(f"{float(t):.0f}" for t in theta)
            print(f"[INF] tracked bearing per 1 s hop: {track} deg")
        else:
            from azoom.pipelines.autosteer import autosteer_enhance

            out, theta = autosteer_enhance(
                mixture, cfg, fov_center_deg=args.angle,
                fov_width_deg=args.fov if args.fov is not None else 60.0,
            )
            print(f"[INF] autosteer locked onto {float(theta):.1f} deg")
    elif args.beamformer == "online":
        from azoom.models.pretrained import load_pretrained_crn_causal
        from azoom.pipelines.online_learned import online_learned_enhance

        model, variables = load_pretrained_crn_causal()
        print("[INF] causal CRN + recursive MVDR (32 ms algorithmic latency)")
        out = online_learned_enhance(mixture, model, variables, cfg)
    elif args.beamformer == "maxsnr_fov":
        import jax.numpy as jnp

        from azoom.beam.gev import max_snr_fov_beamform
        from azoom.dsp.delays import far_field_delays
        from azoom.dsp.stft import istft, rfft_freqs, stft
        from azoom.masks.geometric import ipd_deviation_noise_mask

        Y = stft(mixture, cfg.n_fft, cfg.hop)
        freqs = rfft_freqs(cfg.n_fft, cfg.fs)
        tau = far_field_delays(cfg.angle_target_deg, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        expected_ipd = -2.0 * jnp.pi * freqs * (tau[0] - tau[1])
        noise_mask = ipd_deviation_noise_mask(
            Y, expected_ipd,
            pair_mode="first" if cfg.mic_positions is not None else "mean",
        )
        S = max_snr_fov_beamform(
            Y, noise_mask, freqs, cfg.angle_target_deg,
            args.fov if args.fov is not None else 10.0,
            cfg.mic_dist, cfg.c, cfg.sigma,
        )
        out = istft(S, cfg.n_fft, cfg.hop, length=mixture.shape[-1])
    else:
        model, variables, geo = _load_model_variables(args, cfg)
        if args.track:
            from azoom.pipelines.tracked import tracked_autosteer_enhance

            out, theta = tracked_autosteer_enhance(
                mixture, cfg, fov_center_deg=args.angle,
                fov_width_deg=args.fov if args.fov is not None else 60.0,
                model=model, variables=variables,
                feature_kind=model_features(args),
                beamformer=args.beamformer,
                train_mic_dist=geo,
            )
            track = ", ".join(f"{float(t):.0f}" for t in theta)
            print(f"[INF] tracked bearing per 1 s hop: {track} deg "
                  f"(learned mask steered blind per chunk)")
        elif args.autosteer:
            from azoom.pipelines.autosteer import autosteer_enhance

            out, theta = autosteer_enhance(
                mixture, cfg, fov_center_deg=args.angle,
                fov_width_deg=args.fov if args.fov is not None else 60.0,
                model=model, variables=variables,
                feature_kind=model_features(args),
                beamformer=args.beamformer,
                train_mic_dist=geo,
                harmonic_regen=args.hrnr,
            )
            print(f"[INF] autosteer locked onto {float(theta):.1f} deg "
                  f"(learned mask steered blind)")
        else:
            from azoom.pipelines.learned import learned_enhance_streaming

            out = learned_enhance_streaming(
                mixture, model, variables, cfg,
                beamformer=args.beamformer, feature_kind=model_features(args),
                train_mic_dist=geo, n_nulls=args.nulls,
                harmonic_regen=args.hrnr,
            )

    if timer is not None:
        # Re-run the (now compiled) pipeline under per-stage timing plus an
        # end-to-end RTF — the gen-3 latency report
        # (resnet_model_mvdr/inference.py:270-274).
        import time

        from azoom.utils.profiling import force

        t0 = time.perf_counter()
        force(out)
        wall = time.perf_counter() - t0
        duration = mixture.shape[-1] / fs
        print(timer.report())
        print(f"[INF] end-to-end: {wall:.3f} s for {duration:.2f} s audio "
              f"-> RTF {duration / max(wall, 1e-9):.1f}x realtime")

    out_path = res_dir / f"{args.name}_enhanced.wav"
    write_wav(out_path, to_numpy(out), fs)
    print(f"[INF] Enhanced audio saved to: {out_path}")
    return out_path


def do_eval(args, paths: PathsConfig):
    from azoom.eval.reports import evaluate_run_files

    return evaluate_run_files(
        args.name,
        paths.run_sim_dir(args.name),
        paths.run_results_dir(args.name),
        history_path=args.history,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    paths = PathsConfig(root=Path(args.data_root))
    if args.mode in ("sim", "full"):
        do_sim(args, paths)
    if args.mode in ("inf", "full"):
        do_inf(args, paths)
    if args.mode in ("eval", "full"):
        do_eval(args, paths)


if __name__ == "__main__":
    main()

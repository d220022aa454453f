"""Training CLI: ``python -m azoom.cli.train --model deepfpu --steps 5000``.

Rebuild of the reference trainers (model_training.py:139-182,
model_neural.py:155-187) on the azoom.train loop: on-device synthesized
batches, Adam + BCE, orbax checkpointing with automatic resume, optional
data-parallel execution over all visible devices.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(prog="azoom.train")
    p.add_argument("--model", default="fpu",
                   choices=["fpu", "deepfpu", "tpufpu", "blstm", "crn", "qcnn"])
    p.add_argument("--fold", type=int, default=4,
                   help="tpufpu only: frequency space-to-depth factor")
    p.add_argument("--bneck", type=int, default=8,
                   help="tpufpu only: bottleneck width multiplier "
                        "(channels = base * bneck; 4 = the slim variant)")
    p.add_argument("--init-from", default=None,
                   help="bundled artifact name to warm-start from (e.g. "
                        "'tpufpu' to fine-tune the flagship on a corpus); "
                        "model/base/fold must match the artifact")
    p.add_argument("--features", default="logmag_ipd", choices=["logmag_ipd", "physics"])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--base", type=int, default=32, help="base channel width")
    p.add_argument("--seconds", type=float, default=2.0, help="crop length")
    p.add_argument("--reverb", action="store_true",
                   help="train on room-acoustics (image-source RIR) scenes")
    p.add_argument("--angle-jitter", type=float, default=0.0,
                   help="randomize source angles by +/- this many degrees")
    p.add_argument("--corpus", default=None,
                   help="directory of real WAVs to train on (default: env "
                        "AZOOM_DATA_DIR if set, else synthesized speech)")
    p.add_argument("--native-loader", action="store_true",
                   help="prefetch corpus batches through the C++ engine "
                        "(cpp/corpus_engine.cpp) instead of LocalCorpus")
    p.add_argument("--causal", action="store_true",
                   help="blstm only: unidirectional (streaming frame-latency)")
    p.add_argument("--pinn-weight", type=float, default=0.0,
                   help="weight of the physics-informed IPD-consistency "
                        "residual (PINN-CNN; 0 = plain BCE)")
    p.add_argument("--ckpt", default="checkpoints/mask_estimator")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    args = p.parse_args(argv)

    import jax

    from azoom.config import DEFAULT
    from azoom.models.blstm import BLSTMMaskNet
    from azoom.models.unet import DeepFPU, FreqPreservingUNet
    from azoom.train.loop import fit

    cfg = DEFAULT.replace(mic_dist=0.04)
    if args.model == "blstm":
        model = BLSTMMaskNet(hidden=8 * args.base, unidirectional=args.causal)
    elif args.model == "crn":
        from azoom.models.crn import CRNMaskNet

        model = CRNMaskNet(base=args.base // 2, hidden=4 * args.base,
                           unidirectional=args.causal)
    elif args.model == "tpufpu":
        from azoom.models.unet import TPUFPU

        model = TPUFPU(base=args.base, fold=args.fold, bneck=args.bneck)
    elif args.model == "qcnn":
        from azoom.models.qcnn import QCNNMaskNet

        if args.features != "physics":
            raise SystemExit("qcnn reads quaternion (physics) features; "
                             "pass --features physics")
        model = QCNNMaskNet(base=max(args.base // 4, 1))
    else:
        model_cls = FreqPreservingUNet if args.model == "fpu" else DeepFPU
        model = model_cls(base=args.base)
    init_variables = None
    if args.init_from is not None:
        from azoom.models.pretrained import load_bundled

        _, init_variables, bundled_feats = load_bundled(args.init_from)
        if bundled_feats != args.features:
            raise SystemExit(
                f"--init-from {args.init_from} was trained on "
                f"'{bundled_feats}' features; pass --features {bundled_feats}"
            )
        print(f"[TRAIN] warm-starting from bundled '{args.init_from}'")
    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from azoom.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"[TRAIN] data-parallel over {mesh.devices.size} devices")

    result = fit(
        model,
        cfg,
        n_steps=args.steps,
        batch_size=args.batch,
        learning_rate=args.lr,
        feature_kind=args.features,
        n_samples=int(args.seconds * cfg.fs),
        reverb=args.reverb,
        angle_jitter_deg=args.angle_jitter,
        pinn_weight=args.pinn_weight,
        native_loader=args.native_loader,
        corpus_root=args.corpus or os.environ.get("AZOOM_DATA_DIR"),
        init_variables=init_variables,
        seed=args.seed,
        checkpoint_dir=args.ckpt,
        resume=not args.no_resume,
        mesh=mesh,
    )
    print(f"[TRAIN] finished at step {int(result.state.step)}; ckpt in {args.ckpt}")


if __name__ == "__main__":
    main()

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
                   choices=["oracle", "mvdr", "hard_null", "gev"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--no-reverb", action="store_true")
    p.add_argument("--duration", type=float, default=2.0)
    p.add_argument("--max-order", type=int, default=None,
                   help="image-source order for per-run simulation")
    return p


def run_vectorized(args):
    import jax

    from azoom.config import DEFAULT
    from azoom.eval.reports import append_to_csv
    from azoom.parallel.mesh import make_mesh
    from azoom.parallel.sweep import oracle_sweep, sharded_sweep, sweep_summary

    cfg = DEFAULT.replace(mic_dist=0.04)
    n_dev = len(jax.devices())
    n = args.n + (-args.n) % n_dev  # round up to a multiple of devices
    print(f"[BATCH] vectorized sweep: {n} scenes over {n_dev} device(s)")
    key = jax.random.PRNGKey(args.seed)
    n_samples = int(args.duration * cfg.fs)
    if n_dev > 1:
        mesh = make_mesh()
        with mesh:
            res = sharded_sweep(
                oracle_sweep, key, mesh, n, cfg, n_samples=n_samples, with_stoi=True
            )
    else:
        res = oracle_sweep(key, cfg, n_scenes=n, n_samples=n_samples, with_stoi=True)

    csv_path = Path(args.data_root) / "results" / "batch_metrics.csv"
    import numpy as np

    for i in range(args.n):
        m = {
            "sir_b": float(res["sir_in"][i]),
            "sir_s": float(res["sir_out"][i]),
            "imp": float(res["sir_imp"][i]),
            "sinr_b": 0.0,
            "sinr_s": float(res["sinr_out"][i]),
            "stoi": float(res.get("stoi", np.zeros(args.n))[i]),
            "pesq_wb": 0.0,
            "pesq_nb": 0.0,
        }
        append_to_csv(csv_path, f"{args.prefix}_{args.start + i:03d}", m)
    summ = sweep_summary(res)
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
            + (["--max-order", str(args.max_order)] if args.max_order is not None else [])
            + (["--ckpt", args.ckpt] if args.ckpt else [])
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
        run_per_run(args)
    else:
        run_vectorized(args)


if __name__ == "__main__":
    main()

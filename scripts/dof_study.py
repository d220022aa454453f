"""M-mic degrees-of-freedom study — the wall the 2-mic reference documents.

The reference's readme.md:19 states its central limitation: "blind MVDR
fails vs >= 2 interferers" — an M-mic MVDR has M-1 spatial nulls and the
reference is hard-wired to M=2. azoom's pipelines are M-general (round 3:
azoom.beam.linalgmm unrolled-Cholesky solves); this study measures, on
TPU, what each extra mic buys at each interferer count:

  1. PURE SPATIAL: oracle-covariance MVDR with NO spectral post-filter
     (post_filter='none') — isolates beamforming DoF from TF masking.
  2. BLIND PRODUCT: the bundled int8 nano mask net (trained on 2-mic
     features; the net reads the first mic pair, the MVDR uses all M).

Anechoic, randomized interferer angles, 32 scenes/cell, seed 42.
Repro: python scripts/dof_study.py  (azoom-batch --mics N for campaigns).
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.parallel.sweep import learned_sweep, oracle_sweep

N_SCENES = 32
MICS = (2, 3, 4, 6, 8)
KS = (1, 2, 3, 4)

model, variables, feature_kind = load_bundled("tpufpu_nano", quant=True)

print("=== pure spatial (oracle covariance, post_filter='none') ===",
      flush=True)
print("K\\M " + "".join(f"{m:>10d}" for m in MICS), flush=True)
for k in KS:
    rows = []
    for m in MICS:
        cfg = PipelineConfig(mic_dist=0.04, n_mics=m)
        r = oracle_sweep(
            jax.random.PRNGKey(42), cfg, n_scenes=N_SCENES,
            n_samples=32_000, n_interferers=k, reverb=False,
            randomize=True, post_filter="none",
        )
        imp = np.asarray(r["sir_imp"])
        assert np.all(np.isfinite(imp)), (k, m)
        rows.append(imp.mean())
    print(f"K={k} " + "".join(f"{v:>+10.2f}" for v in rows), flush=True)

print("=== blind (int8 nano mask net + M-mic MVDR) ===", flush=True)
print("K\\M " + "".join(f"{m:>10d}" for m in MICS), flush=True)
for k in KS:
    rows = []
    for m in MICS:
        cfg = PipelineConfig(mic_dist=0.04, n_mics=m)
        r = learned_sweep(
            jax.random.PRNGKey(42), cfg, model, variables,
            n_scenes=N_SCENES, n_samples=32_000, n_interferers=k,
            reverb=False, randomize=True, feature_kind=feature_kind,
            with_stoi=False,
        )
        imp = np.asarray(r["sir_imp"])
        assert np.all(np.isfinite(imp)), (k, m)
        rows.append(imp.mean())
    print(f"K={k} " + "".join(f"{v:>+10.2f}" for v in rows), flush=True)

print("=== blind, reverb RT60=0.5 (room linear array) ===", flush=True)
print("K\\M " + "".join(f"{m:>10d}" for m in (2, 4)), flush=True)
for k in (2, 3):
    rows = []
    for m in (2, 4):
        cfg = PipelineConfig(mic_dist=0.04, n_mics=m)
        r = learned_sweep(
            jax.random.PRNGKey(42), cfg, model, variables,
            n_scenes=N_SCENES, n_samples=32_000, n_interferers=k,
            reverb=True, feature_kind=feature_kind, with_stoi=False,
        )
        imp = np.asarray(r["sir_imp"])
        assert np.all(np.isfinite(imp)), (k, m)
        rows.append(imp.mean())
    print(f"K={k} " + "".join(f"{v:>+10.2f}" for v in rows), flush=True)

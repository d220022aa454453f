"""Q-CNN / PINN-CNN head-to-head at equal short budget (reference roadmap
TODO:6 "PINN-CNN, Q-CNN") — the BLSTM-style architecture-parity study.

Three arms, identical budget/keys/features (physics, anechoic, jitter 3):
  A. FreqPreservingUNet(base=32), plain BCE          (the CNN baseline)
  B. same net + physics-informed IPD residual        (PINN-CNN)
  C. QCNNMaskNet(base=8)  — same real channel widths,
     1/4 the channel-mixing parameters               (Q-CNN)

Reports held-out mask accuracy (unseen keys) and blind anechoic SIR
improvement from the vectorized learned_sweep. Run on TPU:
    python scripts/train_qcnn_study.py [n_steps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

import azoom  # noqa: F401  (compile cache)
from azoom.config import PipelineConfig
from azoom.models.qcnn import QCNNMaskNet
from azoom.models.unet import FreqPreservingUNet, pad_frames
from azoom.parallel.sweep import learned_sweep
from azoom.train.data import synth_batch
from azoom.train.loop import fit, mask_accuracy

cfg = PipelineConfig(mic_dist=0.04)
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def run_arm(name, model, pinn_weight=0.0):
    t0 = time.perf_counter()
    r = fit(
        model, cfg, n_steps=N_STEPS, batch_size=8,
        feature_kind="physics", n_samples=cfg.win_size,
        angle_jitter_deg=3.0, pinn_weight=pinn_weight, seed=11,
        log_every=max(N_STEPS // 4, 1), log_fn=lambda s: print(f"  {s}", flush=True),
    )
    train_s = time.perf_counter() - t0
    variables = {"params": r.state.params, "batch_stats": r.state.batch_stats}

    accs = []
    for i in range(6):
        b = synth_batch(jax.random.PRNGKey(7000 + i), 4, cfg, "physics",
                        cfg.win_size)
        feats, t = pad_frames(b["features"], 16)
        pred = model.apply(variables, feats)[..., :t]
        accs.append(float(mask_accuracy(pred, b["label"])))
    acc = float(np.mean(accs))

    sweep = learned_sweep(
        jax.random.PRNGKey(42), cfg, model, variables,
        n_scenes=32, reverb=False, feature_kind="physics", with_stoi=False,
    )
    imp = np.asarray(sweep["sir_imp"])
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(r.state.params))
    print(f"{name:28s} params={n_params/1e6:.2f}M acc={acc:.3f} "
          f"blind anechoic SIR +{imp.mean():.2f} ± "
          f"{imp.std()/np.sqrt(len(imp)):.2f} dB  (train {train_s:.0f}s)",
          flush=True)


if __name__ == "__main__":
    print(f"budget: {N_STEPS} steps x batch 8, physics features", flush=True)
    run_arm("A: CNN (fpu b32) BCE", FreqPreservingUNet(base=32))
    run_arm("B: PINN-CNN (fpu b32, w=0.3)", FreqPreservingUNet(base=32),
            pinn_weight=0.3)
    run_arm("C: Q-CNN (base=8 quat)", QCNNMaskNet(base=8))

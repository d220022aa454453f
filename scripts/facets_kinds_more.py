"""Interferer-kind facet for the comparison models (same seed/scenes as
facets_slim.py): fpu_multigeo (robust small model) and full tpufpu."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.parallel.sweep import learned_sweep

cfg = PipelineConfig(mic_dist=0.04)
for name in ("fpu_multigeo", "tpufpu"):
    model, variables, feats = load_bundled(name, quant=True)
    for kind in ("speech", "babble", "music", "noise"):
        r = learned_sweep(jax.random.PRNGKey(42), cfg, model, variables,
                          n_scenes=32, reverb=True, interferer_kind=kind,
                          feature_kind=feats, with_stoi=False)
        imp = np.asarray(r["sir_imp"])
        bad = int(np.sum(~np.isfinite(imp)))
        print(f"{name:14s} {kind:8s} +{imp.mean():6.2f} ± "
              f"{imp.std()/np.sqrt(len(imp)):4.2f} dB (n_failed={bad})",
              flush=True)

"""Robustness facets for the slim serving flagship (int8, calibrated):
interferer kinds (the MUSAN axis), steer error, reverb/anechoic."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.parallel.sweep import learned_sweep

cfg = PipelineConfig(mic_dist=0.04)
model, variables, feats = load_bundled("tpufpu_slim", quant=True)

def row(tag, **kw):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, model, variables,
                      n_scenes=32, feature_kind=feats, with_stoi=False, **kw)
    imp = np.asarray(r["sir_imp"])
    bad = int(np.sum(~np.isfinite(imp)))
    print(f"{tag:36s} +{imp.mean():6.2f} ± {imp.std()/np.sqrt(len(imp)):4.2f} dB"
          f"  (n_failed={bad})", flush=True)

for kind in ("speech", "babble", "music", "noise"):
    row(f"reverb, interferer={kind}", reverb=True, interferer_kind=kind)
for err in (0.0, 10.0, 20.0):
    row(f"reverb, steer_error={err:.0f} deg", reverb=True, steer_error_deg=err)
row("anechoic, 3 interferers", reverb=False, n_interferers=3)

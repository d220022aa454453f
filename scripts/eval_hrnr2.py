"""HRNR regime study: the Plapous assumption is quasi-stationary noise.
Measure hrnr off/on where that holds (stationary 1/f interferers, strong
sensor AWGN) vs where it doesn't (competing talkers), plus the
noise_quantile knob."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.parallel.sweep import learned_sweep

cfg = PipelineConfig(mic_dist=0.04)
net, variables, feats = load_bundled("tpufpu_nano", quant=True)


def row(tag, **kw):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, net, variables,
                      n_scenes=32, feature_kind=feats, with_stoi=True, **kw)
    imp = np.asarray(r["sir_imp"]); st = np.asarray(r["stoi"])
    sinr = np.asarray(r["sinr_out"])
    print(f"{tag:52s} SIR +{imp.mean():6.2f} ± {imp.std()/np.sqrt(len(imp)):4.2f}"
          f"  SINR {sinr.mean():6.2f}  STOI {st.mean():.4f}", flush=True)


for hrnr in (False, True):
    row(f"1/f-noise interferers, reverb, hrnr={hrnr}",
        reverb=True, interferer_kind="noise", harmonic_regen=hrnr)
for hrnr in (False, True):
    row(f"speech itf + AWGN snr=5, anechoic, hrnr={hrnr}",
        reverb=False, snr_db=5.0, harmonic_regen=hrnr)
for hrnr in (False, True):
    row(f"1/f itf + AWGN snr=5, anechoic, hrnr={hrnr}",
        reverb=False, interferer_kind="noise", snr_db=5.0,
        harmonic_regen=hrnr)

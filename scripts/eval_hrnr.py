"""A/B the harmonic-regeneration post-filter (azoom.beam.postfilter) on
the serving flagship: 64-scene blind reverb sweep (SIR + STOI) and the
reference's real fixtures (SIR + STOI + PESQ_native), hrnr off vs on.
HRNR targets perceptual quality (re-opening mask-suppressed target
harmonics), so STOI/PESQ are the primary read; SIR guards against
interference leak-back through the re-opened bins."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.pesq_native import pesq_native
from azoom.eval.projection import osinr_osir
from azoom.eval.stoi import stoi
from azoom.io.wav import read_wav
from azoom.models.pretrained import load_bundled, load_pretrained_fpu_reverb
from azoom.parallel.sweep import learned_sweep
from azoom.pipelines.learned import learned_enhance
from azoom.utils import to_numpy
from azoom.wpe.dereverb import wpe_dereverb

cfg = PipelineConfig(mic_dist=0.04)
net, variables, feats = load_bundled("tpufpu_nano", quant=True)

for hrnr in (False, True):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, net, variables,
                      n_scenes=64, feature_kind=feats, with_stoi=True,
                      reverb=True, harmonic_regen=hrnr)
    imp = np.asarray(r["sir_imp"]); st = np.asarray(r["stoi"])
    print(f"reverb 64 hrnr={hrnr!s:5}  SIR +{imp.mean():6.2f} ± "
          f"{imp.std()/8:4.2f}  STOI {st.mean():.4f}", flush=True)

REF = Path("/root/reference/data/inputs")


def load3(m, t, i):
    mix, fs = read_wav(REF / m)
    tgt, _ = read_wav(REF / t)
    itf, _ = read_wav(REF / i)
    n = min(mix.shape[0], len(tgt), len(itf))
    return jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]), jnp.asarray(itf[:n])


def score(tag, out, mix, tgt, itf):
    _, sir = osinr_osir(out, tgt, itf)
    _, sir_in = osinr_osir(mix[0], tgt, itf)
    st = float(stoi(tgt, out))
    p = pesq_native(16000, np.asarray(to_numpy(tgt), np.float64),
                    np.asarray(to_numpy(out), np.float64))
    print(f"{tag:44s} SIR +{float(sir)-float(sir_in):6.2f}  STOI {st:.4f}"
          f"  PESQ-WB_native {p:.3f}", flush=True)


# real 1 cm anechoic 3-source fixture, geo-adapted nano
RCFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
mix, tgt, itf = load3("test_mixture.wav", "test_target_ref.wav",
                      "test_interferer_ref.wav")
for hrnr in (False, True):
    out = learned_enhance(mix, net, variables, RCFG, feature_kind=feats,
                          train_mic_dist=0.04, harmonic_regen=hrnr)
    score(f"REAL 1cm anechoic nano int8 hrnr={hrnr}", out, mix, tgt, itf)

# real reverb 2-source fixture, WPE -> fpu_b32_reverb (the weakest row)
mix, tgt, itf = load3("mixture_2_sources.wav", "target_reference_2.wav",
                      "interference_reference_2.wav")
fmodel, fvars = load_pretrained_fpu_reverb()
dr = wpe_dereverb(mix, RCFG)
for hrnr in (False, True):
    out = learned_enhance(dr, fmodel, fvars, RCFG, harmonic_regen=hrnr)
    score(f"REAL reverb WPE->fpu_reverb hrnr={hrnr}", out, mix, tgt, itf)

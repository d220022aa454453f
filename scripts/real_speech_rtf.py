"""RTF-steered MVDR on the reference repo's real 1 cm fixtures.

Two questions:
1. Parity: with the correctly-specified 1 cm geometry (features
   geometry-adapted as usual), does 'rtf' hold the geometric flagship
   number (+24.7 dB)?
2. Robustness: when the pipeline is mis-configured to the nominal 4 cm
   spacing end-to-end (features NOT adapted, steering wrong — the
   "nobody measured the array" scenario), how much less does 'rtf'
   degrade than 'mvdr'? The steering no longer depends on the geometry
   at all; only the net's IPD features remain spacing-sensitive.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.models.pretrained import load_bundled
from azoom.pipelines.learned import learned_enhance

REF = Path("/root/reference/data/inputs")
mix, fs = read_wav(REF / "test_mixture.wav")
tgt, _ = read_wav(REF / "test_target_ref.wav")
itf, _ = read_wav(REF / "test_interferer_ref.wav")
n = min(mix.shape[0], len(tgt), len(itf))
mix, tgt, itf = jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]), jnp.asarray(itf[:n])


def imp(out):
    _, sir = osinr_osir(out, tgt, itf)
    _, sir_in = osinr_osir(mix[0], tgt, itf)
    return float(sir) - float(sir_in)


net, v, feats = load_bundled("tpufpu_nano", quant=True)

# 1) correctly-specified geometry, features adapted (the flagship recipe)
cfg_right = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
for bf in ("mvdr", "rtf"):
    out = learned_enhance(mix, net, v, cfg_right, beamformer=bf,
                          feature_kind=feats, train_mic_dist=0.04)
    print(f"geometry known   {bf:5s} +{imp(out):.2f} dB", flush=True)

# 2) mis-configured to the nominal 4 cm everywhere (no adaptation)
cfg_wrong = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.04, sigma=1e-7)
for bf in ("mvdr", "rtf"):
    out = learned_enhance(mix, net, v, cfg_wrong, beamformer=bf,
                          feature_kind=feats)
    print(f"geometry UNKNOWN {bf:5s} +{imp(out):.2f} dB", flush=True)

"""Slim TPUFPU on the reference repo's real 1 cm fixtures (blind,
geometry-adapted) — float and int8."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.models.pretrained import load_bundled
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.pipelines.learned import learned_enhance

REF = Path("/root/reference/data/inputs")
CFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
mix, fs = read_wav(REF / "test_mixture.wav")
tgt, _ = read_wav(REF / "test_target_ref.wav")
itf, _ = read_wav(REF / "test_interferer_ref.wav")
n = min(mix.shape[0], len(tgt), len(itf))
mix, tgt, itf = jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]), jnp.asarray(itf[:n])

def imp(out):
    _, sir = osinr_osir(out, tgt, itf)
    _, sir_in = osinr_osir(mix[0], tgt, itf)
    return float(sir) - float(sir_in)

for name in ("tpufpu", "tpufpu_slim"):
    for quant in (False, True):
        net, v, feats = load_bundled(name, quant=quant)
        out = learned_enhance(mix, net, v, CFG, feature_kind=feats,
                              train_mic_dist=0.04)
        print(f"{name:12s} quant={quant!s:5s} steered   +{imp(out):.2f} dB",
              flush=True)
    out, theta = autosteer_enhance(
        mix, CFG, fov_center_deg=90.0, fov_width_deg=60.0,
        model=net, variables=v, feature_kind=feats, train_mic_dist=0.04)
    print(f"{name:12s} int8 autosteer (theta={float(theta):.1f}) "
          f"+{imp(out):.2f} dB", flush=True)

"""Eval the speech-only CONTROL fine-tune (tpufpu_nano_ctl): does merely
continuing training from the nano endpoint — on the very distribution it
was distilled on — cost the real 1 cm fixture the same ~3.5 dB the
mixed-kind fine-tunes did? Decides whether the mk4 real-fixture drop is
continued-training drift (control drops too) or non-speech exposure
(control holds)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU
from azoom.parallel.sweep import learned_sweep
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
    jax.random.PRNGKey(0), probe["features"].shape)
state, step = restore_checkpoint("/root/repo/checkpoints/tpufpu_nano_ctl",
                                 template)
print("ctl checkpoint step:", step, flush=True)
ctl = TPUFPU(base=64, fold=4, quant=True, bneck=4, dec_div=2, enc_div=2)
v_ctl = calibrate_act_scales(
    ctl, {"params": state.params, "batch_stats": state.batch_stats},
    (synth_batch(jax.random.PRNGKey(1000 + i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(3)),
)

r = learned_sweep(jax.random.PRNGKey(42), cfg, ctl, v_ctl, n_scenes=32,
                  feature_kind="physics", with_stoi=False, reverb=True)
imp = np.asarray(r["sir_imp"])
print(f"ctl reverb speech: +{imp.mean():.2f} ± "
      f"{imp.std()/np.sqrt(len(imp)):.2f} dB", flush=True)

from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.pipelines.learned import learned_enhance

REF = Path("/root/reference/data/inputs")
RCFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
mix, fs = read_wav(REF / "test_mixture.wav")
tgt, _ = read_wav(REF / "test_target_ref.wav")
itf, _ = read_wav(REF / "test_interferer_ref.wav")
n = min(mix.shape[0], len(tgt), len(itf))
mix, tgt, itf = (jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]),
                 jnp.asarray(itf[:n]))
out = learned_enhance(mix, ctl, v_ctl, RCFG, feature_kind="physics",
                      train_mic_dist=0.04)
_, sir = osinr_osir(out, tgt, itf)
_, sir_in = osinr_osir(mix[0], tgt, itf)
print(f"ctl REAL 1cm int8 geo-adapted steered  +{float(sir - sir_in):.2f} dB",
      flush=True)

"""Eval the REAL-speech fine-tune (tpufpu_nano_real) vs the bundled nano.

Round-4 VERDICT item 1, the measurement half: after 10k steps on real
recorded speech (scripts/train_nano_real.py), score the int8-calibrated
artifact on
  1. the synthetic reverb sweep (32 scenes, seed 42 — comparable to the
     bundled nano's +21.77 +- 0.62 and the speech-only control's row),
  2. the synthetic anechoic sweep,
  3. the REAL anechoic 3-source fixture, utterance-held-out (bundled
     nano: +24.68 steered / +24.63 autosteer; control after 10k more
     synthetic steps: +22.6),
  4. the REAL reverberant 2-source fixture — IN-DOMAIN for this model
     (its stems are the training corpus), reported with that caveat.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU
from azoom.parallel.sweep import learned_sweep
from azoom.pipelines.learned import learned_enhance
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
    jax.random.PRNGKey(0), probe["features"].shape)
CKPT = ("/root/repo/checkpoints/tpufpu_nano_real_aug"
        if "--aug" in sys.argv else
        "/root/repo/checkpoints/tpufpu_nano_real")
state, step = restore_checkpoint(CKPT, template)
print("real-speech checkpoint step:", step, flush=True)
net = TPUFPU(base=64, fold=4, quant=True, bneck=4, dec_div=2, enc_div=2)
v = calibrate_act_scales(
    net, {"params": state.params, "batch_stats": state.batch_stats},
    (synth_batch(jax.random.PRNGKey(1000 + i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(3)),
)

for reverb in (True, False):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, net, v, n_scenes=32,
                      feature_kind="physics", with_stoi=False, reverb=reverb)
    imp = np.asarray(r["sir_imp"])
    tag = "reverb" if reverb else "anechoic"
    print(f"real-ft synthetic {tag}: +{imp.mean():.2f} ± "
          f"{imp.std()/np.sqrt(len(imp)):.2f} dB", flush=True)

REF = Path("/root/reference/data/inputs")
RCFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)


def fixture(mix_f, tgt_f, itf_f):
    mix, _ = read_wav(REF / mix_f)
    tgt, _ = read_wav(REF / tgt_f)
    itf, _ = read_wav(REF / itf_f)
    tgt = tgt[:, 0] if tgt.ndim > 1 else tgt
    itf = itf[:, 0] if itf.ndim > 1 else itf
    n = min(mix.shape[0], len(tgt), len(itf))
    return (jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]),
            jnp.asarray(itf[:n]))


def score(out, mix, tgt, itf):
    _, sir = osinr_osir(out, tgt, itf)
    _, sir_in = osinr_osir(mix[0], tgt, itf)
    return float(sir - sir_in)


# held-out: no utterance overlap with the training corpus
mix, tgt, itf = fixture("test_mixture.wav", "test_target_ref.wav",
                        "test_interferer_ref.wav")
out = learned_enhance(mix, net, v, RCFG, feature_kind="physics",
                      train_mic_dist=0.04)
print(f"real-ft REAL 1cm HELD-OUT steered: +{score(out, mix, tgt, itf):.2f} dB",
      flush=True)

from azoom.pipelines.autosteer import autosteer_enhance  # noqa: E402

out_a, theta = autosteer_enhance(
    mix, RCFG, model=net, variables=v, feature_kind="physics",
    train_mic_dist=0.04)
print(f"real-ft REAL 1cm HELD-OUT autosteer (theta={float(theta):.1f}): "
      f"+{score(out_a, mix, tgt, itf):.2f} dB", flush=True)

# in-domain: the training corpus IS this scene's stems — caveat applies
mix2, tgt2, itf2 = fixture("mixture_2_sources.wav", "target_reference_2.wav",
                           "interference_reference_2.wav")
out2 = learned_enhance(mix2, net, v, RCFG, feature_kind="physics",
                       train_mic_dist=0.04)
print(f"real-ft REAL reverb 2src IN-DOMAIN steered: "
      f"+{score(out2, mix2, tgt2, itf2):.2f} dB", flush=True)

"""Held-out + robustness facets for the micro TPUFPU (nano tree at
base=32, distilled 40k steps from tpufpu_slim — FLOP-cut study #5) vs
the bundled nano flagship. Same rows as scripts/eval_pico.py so columns
are comparable across the study series."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.parallel.sweep import learned_sweep
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, mask_accuracy, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(
    TPUFPU(base=32, fold=4, bneck=4, dec_div=2, enc_div=2),
    jax.random.PRNGKey(0), probe["features"].shape)
state, step = restore_checkpoint("/root/repo/checkpoints/tpufpu_micro_phy",
                                 template)
print("micro checkpoint step:", step, flush=True)
micro = TPUFPU(base=32, fold=4, quant=True, bneck=4, dec_div=2, enc_div=2)
v_micro = calibrate_act_scales(
    micro, {"params": state.params, "batch_stats": state.batch_stats},
    (synth_batch(jax.random.PRNGKey(1000 + i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(3)),
)
nano, v_nano, _ = load_bundled("tpufpu_nano", quant=True)

# held-out mask accuracy
for name, m, v in (("nano", nano, v_nano), ("micro", micro, v_micro)):
    accs = []
    for i in range(6):
        b = synth_batch(jax.random.PRNGKey(7000 + i), 4, cfg, "physics",
                        cfg.win_size)
        feats, t = pad_frames(b["features"], 16)
        accs.append(float(mask_accuracy(m.apply(v, feats)[..., :t],
                                        b["label"])))
    print(f"{name} held-out mask acc: {np.mean(accs):.3f}", flush=True)


def row(tag, m, v, **kw):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, m, v,
                      n_scenes=32, feature_kind="physics", with_stoi=False,
                      **kw)
    imp = np.asarray(r["sir_imp"])
    bad = int(np.sum(~np.isfinite(imp)))
    print(f"{tag:44s} +{imp.mean():6.2f} ± {imp.std()/np.sqrt(len(imp)):4.2f}"
          f" dB  (n_failed={bad})", flush=True)


for name, m, v in (("nano", nano, v_nano), ("micro", micro, v_micro)):
    for kind in ("speech", "babble", "music", "noise"):
        row(f"{name}: reverb, interferer={kind}", m, v, reverb=True,
            interferer_kind=kind)
    for err in (0.0, 10.0, 20.0):
        row(f"{name}: reverb, steer_error={err:.0f} deg", m, v, reverb=True,
            steer_error_deg=err)
    row(f"{name}: anechoic, 3 interferers", m, v, reverb=False,
        n_interferers=3)

# --- real 1 cm fixture, geo-adapted ---
from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.pipelines.autosteer import autosteer_enhance
from azoom.pipelines.learned import learned_enhance

REF = Path("/root/reference/data/inputs")
if (REF / "test_mixture.wav").exists():
    RCFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
    mix, fs = read_wav(REF / "test_mixture.wav")
    tgt, _ = read_wav(REF / "test_target_ref.wav")
    itf, _ = read_wav(REF / "test_interferer_ref.wav")
    n = min(mix.shape[0], len(tgt), len(itf))
    mix, tgt, itf = (jnp.asarray(mix[:n].T), jnp.asarray(tgt[:n]),
                     jnp.asarray(itf[:n]))

    def imp(out):
        _, sir = osinr_osir(out, tgt, itf)
        _, sir_in = osinr_osir(mix[0], tgt, itf)
        return float(sir) - float(sir_in)

    out = learned_enhance(mix, micro, v_micro, RCFG,
                          feature_kind="physics", train_mic_dist=0.04)
    print(f"micro REAL 1cm int8 geo-adapted steered  +{imp(out):.2f} dB",
          flush=True)
    out, theta = autosteer_enhance(
        mix, RCFG, fov_center_deg=90.0, fov_width_deg=60.0,
        model=micro, variables=v_micro, feature_kind="physics",
        train_mic_dist=0.04)
    print(f"micro REAL 1cm int8 autosteer (theta={float(theta):.1f})   "
          f"+{imp(out):.2f} dB", flush=True)

"""Robustness facets for the frequency-attention nano TPUFPU ("fan":
bneck=4, dec_div=2, enc_div=2, fattn=4; int8 convs, calibrated) from the
training checkpoint — same rows as scripts/facets_dslim.py so every
column is directly comparable to nano/slim. Also prints mask accuracy and
a net-only latency row so the MAC cost of attention is priced."""
import sys
import time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.parallel.sweep import learned_sweep
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, mask_accuracy, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)
SPEC = dict(base=64, fold=4, bneck=4, dec_div=2, enc_div=2, fattn=4)
CKPT = "/root/repo/checkpoints/tpufpu_fan_phy"

probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(TPUFPU(**SPEC), jax.random.PRNGKey(0),
                        probe["features"].shape)
state, step = restore_checkpoint(CKPT, template)
print("checkpoint step:", step, flush=True)
model = TPUFPU(quant=True, **SPEC)
variables = calibrate_act_scales(
    model, {"params": state.params, "batch_stats": state.batch_stats},
    (synth_batch(jax.random.PRNGKey(1000 + i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(3)),
)

accs = []
for i in range(6):
    b = synth_batch(jax.random.PRNGKey(7000 + i), 4, cfg, "physics",
                    cfg.win_size)
    feats, t = pad_frames(b["features"], 16)
    pred = model.apply(variables, feats)[..., :t]
    accs.append(float(mask_accuracy(pred, b["label"])))
print(f"mask acc: {float(np.mean(accs)):.3f}", flush=True)


def row(tag, n_scenes=32, **kw):
    r = learned_sweep(jax.random.PRNGKey(42), cfg, model, variables,
                      n_scenes=n_scenes, feature_kind="physics",
                      with_stoi=False, **kw)
    imp = np.asarray(r["sir_imp"])
    bad = int(np.sum(~np.isfinite(imp)))
    print(f"{tag:36s} +{imp.mean():6.2f} ± {imp.std()/np.sqrt(len(imp)):4.2f} dB"
          f"  (n_failed={bad})", flush=True)


row("anechoic, 2 interferers (64)", n_scenes=64, reverb=False)
row("reverb, 2 interferers (64)", n_scenes=64, reverb=True)
for kind in ("speech", "babble", "music", "noise"):
    row(f"reverb, interferer={kind}", reverb=True, interferer_kind=kind)
for err in (0.0, 10.0, 20.0):
    row(f"reverb, steer_error={err:.0f} deg", reverb=True, steer_error_deg=err)
row("anechoic, 3 interferers", reverb=False, n_interferers=3)

# --- net-only latency (B=128, in-jit loop) ---
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((128, 513, 64, 4)), jnp.float32)
feats, _ = pad_frames(feats, 16)
loop = jax.jit(lambda f, v: jax.lax.fori_loop(
    0, 20, lambda i, c: model.apply(v, f + 1e-6 * c[..., None]).astype(jnp.float32),
    jnp.zeros(f.shape[:3], jnp.float32)))
float(jnp.sum(jnp.abs(loop(feats, variables))))
t0 = time.perf_counter()
float(jnp.sum(jnp.abs(loop(feats, variables))))
dt = (time.perf_counter() - t0) / 20
print(f"net-only latency (B=128): {dt*1e3:.2f} ms", flush=True)

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

    out = learned_enhance(mix, model, variables, RCFG,
                          feature_kind="physics", train_mic_dist=0.04)
    print(f"REAL 1cm int8 geo-adapted steered    +{imp(out):.2f} dB", flush=True)
    out, theta = autosteer_enhance(
        mix, RCFG, fov_center_deg=90.0, fov_width_deg=60.0,
        model=model, variables=variables, feature_kind="physics",
        train_mic_dist=0.04)
    print(f"REAL 1cm int8 autosteer (theta={float(theta):.1f})  "
          f"+{imp(out):.2f} dB", flush=True)

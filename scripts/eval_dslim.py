"""Head-to-head: half-decoder slim TPUFPU (bneck=4, dec_div=2, fresh
20k-step train) vs the bundled slim flagship (bneck=4) on identical
held-out scenes. Same protocol as scripts/eval_slim.py."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.parallel.sweep import learned_sweep
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, mask_accuracy, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)
CKPT = "/root/repo/checkpoints/tpufpu_b64s4d2_phy"


def load_dslim():
    model = TPUFPU(base=64, fold=4, quant=True, bneck=4, dec_div=2)
    probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
    template = create_state(
        TPUFPU(base=64, fold=4, bneck=4, dec_div=2), jax.random.PRNGKey(0),
        probe["features"].shape,
    )
    state, step = restore_checkpoint(CKPT, template)
    print(f"dslim checkpoint at step {step}", flush=True)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def evaluate(name, model, variables):
    variables = calibrate_act_scales(
        model, variables,
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
    acc = float(np.mean(accs))

    rows = {}
    for tag, reverb in (("anechoic", False), ("reverb", True)):
        r = learned_sweep(
            jax.random.PRNGKey(42), cfg, model, variables,
            n_scenes=64, reverb=reverb, feature_kind="physics",
            with_stoi=False,
        )
        imp = np.asarray(r["sir_imp"])
        rows[tag] = float(imp.mean())
        rows[tag + "_sem"] = float(imp.std() / np.sqrt(len(imp)))

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((128, 513, 64, 4)), jnp.float32)
    feats, _ = pad_frames(feats, 16)
    loop = jax.jit(lambda f, v: jax.lax.fori_loop(
        0, 20, lambda i, c: model.apply(v, f + 1e-6 * c[..., None]).astype(jnp.float32),
        jnp.zeros(f.shape[:3], jnp.float32)))
    float(jnp.sum(jnp.abs(loop(feats, variables))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(feats, variables))))
    dt = (time.perf_counter() - t0) / 20

    print(f"{name:28s} acc={acc:.3f}  "
          f"anechoic=+{rows['anechoic']:.2f}±{rows['anechoic_sem']:.2f} dB  "
          f"reverb=+{rows['reverb']:.2f}±{rows['reverb_sem']:.2f} dB  "
          f"net={dt*1e3:.2f} ms", flush=True)
    return acc, rows, dt


if __name__ == "__main__":
    sm, sv, _ = load_bundled("tpufpu_slim", quant=True)
    evaluate("slim bneck=4 (bundled)", sm, sv)
    dm, dv = load_dslim()
    evaluate("dslim bneck=4 dec_div=2", dm, dv)

"""Untrained-net speed check: TPUFPU bneck=4 (slim) vs bneck=8 (flagship),
int8 calibrated, serving shapes. Decides whether the slim retrain is worth
the training budget."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

B, ITERS = 128, 20
cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B,) + probe["features"].shape[1:]), jnp.float32)
feats, _ = pad_frames(feats, 16)

def timed(name, model, v):
    loop = jax.jit(lambda f, v: jax.lax.fori_loop(
        0, ITERS, lambda i, c: model.apply(v, f + 1e-6 * c[..., None]).astype(jnp.float32),
        jnp.zeros(f.shape[:3], jnp.float32)))
    float(jnp.sum(jnp.abs(loop(feats, v))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(feats, v))))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {dt*1e3:8.2f} ms/step", flush=True)
    return dt

for bneck in (8, 4):
    model = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=True, bneck=bneck)
    state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
    v = {"params": state.params, "batch_stats": state.batch_stats}
    v = calibrate_act_scales(model, v, (synth_batch(jax.random.PRNGKey(i), 4,
        cfg, "physics", cfg.win_size)["features"] for i in range(1, 3)))
    timed(f"tpufpu bneck={bneck} int8", model, v)

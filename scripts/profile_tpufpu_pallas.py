"""Head-to-head: TPUFPU.apply (XLA int8) vs tpufpu_apply_pallas (fused
im2col kernel) on the real chip, serving shapes."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.pallas.tpufpu_serve import tpufpu_apply_pallas
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

B, ITERS = 128, 20
cfg = PipelineConfig(mic_dist=0.04)
model = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=True)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
v = {"params": state.params, "batch_stats": state.batch_stats}
v = calibrate_act_scales(model, v, (synth_batch(jax.random.PRNGKey(i), 4,
    cfg, "physics", cfg.win_size)["features"] for i in range(1, 4)))

rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B,) + probe["features"].shape[1:]),
                    jnp.float32)
feats, _ = pad_frames(feats, 16)
print("feats:", feats.shape, flush=True)

def timed(name, fn):
    loop = jax.jit(lambda f, v: jax.lax.fori_loop(
        0, ITERS, lambda i, c: fn(f + 1e-6 * c[..., None], v),
        jnp.zeros(f.shape[:3], jnp.float32)))
    out = loop(feats, v)
    float(jnp.sum(jnp.abs(out)))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(feats, v))))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms/step", flush=True)
    return dt

a = timed("TPUFPU.apply (XLA int8)", lambda f, v: model.apply(v, f).astype(jnp.float32))
b = timed("tpufpu_apply_pallas (fused im2col)",
          lambda f, v: tpufpu_apply_pallas(model, v, f).astype(jnp.float32))
print(f"ratio xla/pallas: {a/b:.3f}", flush=True)
# numerical sanity on device
m1 = model.apply(v, feats[:4])
m2 = tpufpu_apply_pallas(model, v, feats[:4])
print("max mask diff:", float(jnp.max(jnp.abs(
    m1.astype(jnp.float32) - m2.astype(jnp.float32)))), flush=True)

"""Throughput-knee scan for the slim flagship: is batch=128 still optimal?"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU
from azoom.pipelines.learned import learned_enhance
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

cfg = PipelineConfig(mic_dist=0.04)
model = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=True, bneck=4)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
v = {"params": state.params, "batch_stats": state.batch_stats}
v = calibrate_act_scales(model, v, (synth_batch(jax.random.PRNGKey(i), 4,
    cfg, "physics", cfg.win_size)["features"] for i in range(1, 3)))
n = cfg.win_size
rng = np.random.default_rng(0)
for B in (96, 128, 192, 256):
    mix = jnp.asarray(rng.standard_normal((B, 2, n)) * 0.1, jnp.float32)
    iters = 10
    loop = jax.jit(lambda m, v: jax.lax.fori_loop(
        0, iters, lambda i, c: learned_enhance(
            m + 1e-6 * c[:, None, :], model, v, cfg, beamformer="mvdr",
            feature_kind="physics", use_pallas=True),
        jnp.zeros((B, n))))
    float(jnp.sum(jnp.abs(loop(mix, v))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(mix, v))))
    dt = (time.perf_counter() - t0) / iters
    rtf = B * (n / cfg.fs) / dt
    print(f"B={B:4d}  {dt*1e3:7.2f} ms/step  {rtf:9.1f}x realtime", flush=True)

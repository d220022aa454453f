"""Untrained-net speed check for FLOP-cut study #5 candidates vs nano.

After tfold=2 failed on quality (RESULTS.md study #4), the remaining
levers are further WIDTH cuts — history says width cuts hold under
distillation (bneck=4, dec_div=2, enc_div=2 all closed at 20-40k steps)
while grid cuts do not (fold=8, tfold=2 both cost dB). Candidates:

  micro    = nano at base=32  (half width EVERYWHERE: 4x fewer MACs,
             but e1/e2/d2/d1 drop to 32 ch — below the 128-lane MXU,
             so realized latency will undershoot the MAC cut)
  edq      = nano with enc_div=4, dec_div=4 at base=64 (quarter-width
             middles, full-width e1/d1 and bottleneck kept)

Serving shapes (B=128, 2 s chunks), int8 calibrated, fast-DFT DSP —
decides whether a 40k-step distillation run is worth the budget.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.pipelines.learned import learned_enhance
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

B, ITERS = 128, 20
cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B,) + probe["features"].shape[1:]), jnp.float32)
feats, _ = pad_frames(feats, 16)
mix = jnp.asarray(rng.standard_normal((B, 2, cfg.win_size)) * 0.1, jnp.float32)


def timed(name, make_loop, *args):
    loop = jax.jit(make_loop)
    float(jnp.sum(jnp.abs(loop(*args))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(*args))))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:8.2f} ms/step", flush=True)
    return dt


CANDIDATES = (
    ("nano", dict(base=64, bneck=4, dec_div=2, enc_div=2)),
    ("micro b32", dict(base=32, bneck=4, dec_div=2, enc_div=2)),
    ("edq e4d4", dict(base=64, bneck=4, dec_div=4, enc_div=4)),
)

for name, kw in CANDIDATES:
    model = TPUFPU(fold=4, dtype=jnp.bfloat16, quant=True, **kw)
    state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
    v = {"params": state.params, "batch_stats": state.batch_stats}
    v = calibrate_act_scales(model, v, (synth_batch(jax.random.PRNGKey(i), 4,
        cfg, "physics", cfg.win_size)["features"] for i in range(1, 3)))
    n_par = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    print(f"{name}: {n_par/1e6:.2f}M params", flush=True)

    def net_loop(feats, v, model=model):
        def body(i, carry):
            return model.apply(v, feats + 1e-6 * carry[..., None])
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros(feats.shape[:1] + feats.shape[1:3]))
    timed(f"{name} net int8", net_loop, feats, v)

    def full_loop(mix, v, model=model):
        def body(i, carry):
            return learned_enhance(mix + 1e-6 * carry[:, None, :], model, v,
                                   cfg, beamformer="mvdr",
                                   feature_kind="physics", use_pallas=True,
                                   dsp_precision="fast")
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((B, cfg.win_size)))
    dt = timed(f"{name} full step (fast DFT)", full_loop, mix, v)
    print(f"{name} realtime factor: {B * 2.0 / dt:,.0f}x", flush=True)

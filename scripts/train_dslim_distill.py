"""Distill the slim flagship into the half-decoder slim TPUFPU.

Round-3 FLOP-cut study #2b: the fresh-trained dec_div=2 net trades
-0.6 dB reverb / -2.1 dB anechoic for 1.21x net speed (scripts/
eval_dslim.py). Standard soft-target distillation from the bundled
tpufpu_slim (float) tries to buy that quality back: warm-start from the
20k dslim checkpoint, 10k more steps on the blend
0.5 * oracle_IBM + 0.5 * teacher_prob.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.unet import TPUFPU, pad_frames
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, fit, restore_checkpoint

cfg = PipelineConfig(mic_dist=0.04)

# Teacher: the bundled slim flagship, float path, frozen.
tmodel, tvars, _ = load_bundled("tpufpu_slim")


@jax.jit
def teacher_fn(features):
    f, t = pad_frames(features, 16)
    return jax.lax.stop_gradient(tmodel.apply(tvars, f)[..., :t])


# Student: warm-start from the fresh dslim checkpoint.
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2), jax.random.PRNGKey(0),
    probe["features"].shape,
)
state, step = restore_checkpoint(
    "/root/repo/checkpoints/tpufpu_b64s4d2_phy", template
)
print(f"[DISTILL] warm start from dslim step {step}")

res = fit(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2),
    cfg,
    n_steps=10_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    init_variables={"params": state.params, "batch_stats": state.batch_stats},
    checkpoint_dir="/root/repo/checkpoints/tpufpu_b64s4d2_distill",
    resume=True,
    log_every=200,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
)
print(f"[DISTILL] done at step {int(res.state.step)}")

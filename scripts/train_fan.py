"""Train the frequency-attention nano TPUFPU ("fan": bneck=4, dec_div=2,
enc_div=2, fattn=4) by distillation from the slim flagship, from scratch.

Round-3 quality study: every FLOP cut below nano failed on quality (tfold
grid cut, base=32 width cut), so the remaining frontier is the other
direction — can ~1.5 % more MACs, spent on a GLOBAL frequency look
(azoom.models.unet.FreqAttention: pre-LN MHSA over the folded-frequency
axis + 2x MLP at the bottleneck), beat nano at nano's speed class? The
conv tree's receptive field covers only a local band; harmonic structure
and the bearing's IPD signature are band-global.

Recipe is EXACTLY the nano recipe (scripts/train_eslim.py) so the
comparison is equal-budget: from scratch, 40k steps (two 20k runs with
resume=True), batch 8, physics features, +-3 deg jitter, soft targets
0.5*IBM + 0.5*tpufpu_slim probability.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.unet import TPUFPU, pad_frames
from azoom.train.loop import fit

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

cfg = PipelineConfig(mic_dist=0.04)
tmodel, tvars, _ = load_bundled("tpufpu_slim")


@jax.jit
def teacher_fn(features):
    f, t = pad_frames(features, 16)
    return jax.lax.stop_gradient(tmodel.apply(tvars, f)[..., :t])


res = fit(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2, fattn=4),
    cfg,
    n_steps=N_STEPS,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_fan_phy",
    resume=True,
    log_every=200,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

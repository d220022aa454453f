"""Train the micro TPUFPU (nano widths halved again: base=32) by
distillation from the slim flagship, from scratch.

Round-3 FLOP-cut study #5: after tfold=2 (the grid cut) failed on
quality, the width axis is the one with a perfect record under
distillation (bneck=4, dec_div=2, enc_div=2 all closed). micro = the
nano tree at base=32 (1.0M params, ~4x fewer MACs than nano; e1/e2/d2/d1
run at 32 channels, below the 128-lane MXU, so the realized net cut is
~2.1x — scripts/profile_micro.py: net 9.6 -> 4.5 ms, full serving step
12.5 -> 7.3 ms, 20.5k -> 35.0k x realtime at B=128). Same 40k-step
soft-target recipe that closed the enc_div=2 gap.
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

cfg = PipelineConfig(mic_dist=0.04)
tmodel, tvars, _ = load_bundled("tpufpu_slim")


@jax.jit
def teacher_fn(features):
    f, t = pad_frames(features, 16)
    return jax.lax.stop_gradient(tmodel.apply(tvars, f)[..., :t])


res = fit(
    TPUFPU(base=32, fold=4, bneck=4, dec_div=2, enc_div=2),
    cfg,
    n_steps=40_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_micro_phy",
    resume=True,
    log_every=500,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

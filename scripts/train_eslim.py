"""Train the encoder-slim TPUFPU (bneck=4, dec_div=2, enc_div=2) by
distillation from the slim flagship, from scratch.

Round-3 FLOP-cut study #3: after bneck=4 (-32 %) and dec_div=2 (-34 %),
the remaining MAC mass is the e2/e3 encoder levels (~37 % of the dslim
net). enc_div=2 halves them (e2 64, e3 128 channels — still >= 64 MXU
lanes everywhere). Unlike the decoder these ARE the representation and
the skip sources, so this is the riskiest cut; quality is held (or not —
measure!) by 20k steps of soft-target distillation from tpufpu_slim
(0.5*IBM + 0.5*teacher), the recipe that fully recovered the dec_div=2
gap (scripts/train_dslim_distill.py).
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
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
    cfg,
    n_steps=20_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_b64s4d2e2_phy",
    resume=True,
    log_every=200,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

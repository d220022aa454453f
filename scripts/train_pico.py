"""Train the pico TPUFPU (nano + tfold=2: time space-to-depth stem) by
distillation from the slim flagship, from scratch.

Round-3 FLOP-cut study #4: after the width knobs (bneck=4, dec_div=2,
enc_div=2 — the nano net, 14.7k-x flagship), the remaining MAC mass is
spread roughly evenly across levels, so the next lever is the grid, not
the widths. tfold=2 halves every level's time rows (~1.8x MAC cut; the
stem conv is cin-compensated) while the head keeps full mask resolution
through fold*tfold lanes. Frequency was the expensive axis to coarsen
(fold=8 cost -1.45 dB); masks are much smoother in time (phoneme rate),
so this is the cheap direction. Quality held (or not — measure!) by the
same 40k-step soft-target distillation from tpufpu_slim that closed the
enc_div=2 gap (scripts/train_eslim.py; RESULTS.md round 3).
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
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2, tfold=2),
    cfg,
    n_steps=40_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_pico_phy",
    resume=True,
    log_every=500,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

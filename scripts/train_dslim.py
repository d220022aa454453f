"""Train the slim-bottleneck half-decoder TPUFPU (bneck=4, dec_div=2).

Round-3 FLOP-cut study #2: after bneck=4 the MAC center of gravity is the
decoder (d3 31 % + d2 19 %); halving the non-final decoder levels cuts the
slim net's MACs a further 34 % (38.7 -> 25.6 GMac per 128-frame chunk)
with every conv still >= 64 output channels. Same flagship recipe as
scripts/train_slim.py.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp  # noqa: F401
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.unet import TPUFPU
from azoom.train.loop import fit

cfg = PipelineConfig(mic_dist=0.04)
res = fit(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2),
    cfg,
    n_steps=20_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_b64s4d2_phy",
    resume=True,
    log_every=200,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

"""Calibrate + quantize the nano TPUFPU checkpoint (bneck=4, dec_div=2,
enc_div=2, distilled 40k steps from tpufpu_slim — scripts/train_eslim.py)
into the bundled artifact tpufpu_b64s4d2e2_phy_int8.npz. Pass a
checkpoint dir to override the default."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales, save_quantized
from azoom.models.unet import TPUFPU
from azoom.train.data import synth_batch
from azoom.train.loop import create_state, restore_checkpoint

ckpt_dir = (
    sys.argv[1] if len(sys.argv) > 1
    else "/root/repo/checkpoints/tpufpu_b64s4d2e2_phy"
)
cfg = PipelineConfig(mic_dist=0.04)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
template = create_state(TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
                        jax.random.PRNGKey(0), probe["features"].shape)
state, step = restore_checkpoint(ckpt_dir, template)
print("checkpoint step:", step)
v = {"params": state.params, "batch_stats": state.batch_stats}
model_q = TPUFPU(base=64, fold=4, quant=True, bneck=4, dec_div=2, enc_div=2)
v = calibrate_act_scales(
    model_q, v,
    (synth_batch(jax.random.PRNGKey(1000 + i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(3)),
)
n = save_quantized("/root/repo/azoom/assets/tpufpu_b64s4d2e2_phy_int8.npz", v)
print(f"wrote {n/1e6:.1f} MB")

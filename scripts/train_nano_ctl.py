"""CONTROL for the mixed-kind fine-tune: nano +10k steps, SPEECH-only.

Every mixed-interferer fine-tune recipe tried (scripts/train_nano_mk.py
iterations #1-#4: hard IBM at lr 1e-4 and 2e-5, self-distillation anchor,
and the original 0.5*IBM + 0.5*slim-teacher soft targets) lost 3.2-4.2 dB
on the REAL 1 cm fixture while holding or improving every synthetic facet.
Before blaming the mixed scene distribution, run the null experiment: the
exact mk4 recipe with interferer_kind='speech' — i.e. 10k MORE steps of
the distribution nano was distilled on. If the real fixture drops here
too, the drop is continued-training drift away from the 40k-distillation
endpoint (an out-of-distribution-transfer sweet spot), not a property of
the non-speech data, and the mixed-kind artifact is the better ship.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.unet import TPUFPU, pad_frames
from azoom.train.loop import fit

import jax

_, init_vars, _ = load_bundled("tpufpu_nano", quant=False)
tmodel, tvars, _ = load_bundled("tpufpu_slim", quant=False)


@jax.jit
def teacher_fn(features):
    f, t = pad_frames(features, 16)
    return jax.lax.stop_gradient(tmodel.apply(tvars, f)[..., :t])

cfg = PipelineConfig(mic_dist=0.04)
res = fit(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
    cfg,
    n_steps=10_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    interferer_kind="speech",
    init_variables=init_vars,
    teacher_fn=teacher_fn,
    distill_alpha=0.5,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_nano_ctl",
    resume=True,
    log_every=500,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

"""Fine-tune the nano flagship on MIXED interferer kinds (+10k steps).

The round-3 interferer-kind facet showed the speech-only-trained nets
give back ~4 dB against babble and colored-noise interferers (babble
+17.4 / noise +17.6 vs speech +21.4 — RESULTS.md non-speech facet): the
training distribution never contained them, the reference's --dataset
musan axis. This warm-starts from the bundled nano artifact (dequantized
float weights — weight quantization is measured downstream-lossless)
and trains 10k steps with interferer_kind='mixed' (uniform random
speech/babble/music/noise per interferer per scene) against PURE oracle
IBM targets — no teacher, because the speech-trained teacher's soft
targets on non-speech scenes are exactly the bias being removed.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.models.pretrained import load_bundled
from azoom.models.unet import TPUFPU
from azoom.train.loop import fit

_, init_vars, _ = load_bundled("tpufpu_nano", quant=False)

cfg = PipelineConfig(mic_dist=0.04)
res = fit(
    TPUFPU(base=64, fold=4, bneck=4, dec_div=2, enc_div=2),
    cfg,
    n_steps=10_000,
    batch_size=8,
    feature_kind="physics",
    angle_jitter_deg=3.0,
    interferer_kind="mixed",
    init_variables=init_vars,
    checkpoint_dir="/root/repo/checkpoints/tpufpu_nano_mk",
    resume=True,
    log_every=500,
)
print(f"[TRAIN] done at step {int(res.state.step)}")

"""Int8 MXU inference path (QConv / quant=True models).

The parameter tree is unchanged (weights quantize inside the graph), so
every bundled checkpoint runs on the int8 path directly. Validation:
structural tree compatibility, mask parity with the float path, and
end-to-end blind SIR parity on a bundled artifact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

from azoom.config import PipelineConfig
from azoom.models.unet import DeepFPU, FreqPreservingUNet, QConv, TPUFPU
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

CFG = PipelineConfig(mic_dist=0.04)


def test_qconv_matches_nn_conv_param_tree():
    import flax.linen as nn

    x = jnp.ones((1, 16, 16, 8))
    v_q = QConv(12, (3, 3)).init(jax.random.PRNGKey(0), x)
    v_f = nn.Conv(12, (3, 3), padding="SAME").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_q) == jax.tree_util.tree_structure(v_f)
    shapes_q = jax.tree_util.tree_map(jnp.shape, v_q)
    shapes_f = jax.tree_util.tree_map(jnp.shape, v_f)
    assert shapes_q == shapes_f
    # int8 conv ~ float conv within quantization tolerance
    y_q = QConv(12, (3, 3)).apply(v_f, x)
    y_f = nn.Conv(12, (3, 3), padding="SAME").apply(v_f, x)
    rel = float(jnp.max(jnp.abs(y_q - y_f)) / (jnp.max(jnp.abs(y_f)) + 1e-9))
    assert rel < 0.05, rel


@pytest.mark.parametrize(
    "cls,kind",
    [(FreqPreservingUNet, "logmag_ipd"), (DeepFPU, "physics"),
     (TPUFPU, "physics")],
)
def test_quant_model_mask_parity(cls, kind):
    m_f = cls(base=8)
    m_q = cls(base=8, quant=True)
    batch = synth_batch(jax.random.PRNGKey(0), 2, CFG, kind, 16_384)
    state = create_state(m_f, jax.random.PRNGKey(0), batch["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_f = m_f.apply(variables, batch["features"])
    out_q = m_q.apply(variables, batch["features"])
    assert float(jnp.max(jnp.abs(out_f - out_q))) < 0.08
    assert float(jnp.mean((out_f > 0.5) == (out_q > 0.5))) > 0.93


def test_calibrated_static_act_scales():
    """Post-training activation-scale calibration: quant_stats records one
    scale per QConv, the static path tracks the dynamic path closely, and
    the init tree stays checkpoint-compatible (no quant_stats at init)."""
    from azoom.models.quantize import calibrate_act_scales

    model = DeepFPU(base=8, quant=True)
    batch = synth_batch(jax.random.PRNGKey(0), 2, CFG, "physics", 16_384)
    state = create_state(model, jax.random.PRNGKey(0), batch["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    assert "quant_stats" not in model.init(
        jax.random.PRNGKey(0), batch["features"]
    )
    cal = calibrate_act_scales(
        model, variables,
        [synth_batch(jax.random.PRNGKey(i), 2, CFG, "physics", 16_384)["features"]
         for i in range(2)],
    )
    scales = jax.tree_util.tree_leaves(cal["quant_stats"])
    assert len(scales) == 27  # one per 3x3 conv in DeepFPU
    assert all(float(s) > 0 for s in scales)
    out_dyn = model.apply(variables, batch["features"])
    out_sta = model.apply(cal, batch["features"])
    assert float(jnp.max(jnp.abs(out_dyn - out_sta))) < 0.08


def test_bundled_artifacts_carry_act_scales():
    """Bundled .npz artifacts ship calibrated static scales, so serving
    with quant=True never pays the per-conv dynamic reduction."""
    from azoom.models.pretrained import (
        load_pretrained_deepfpu,
        load_pretrained_fpu,
        load_pretrained_tpufpu,
        load_pretrained_tpufpu_nano,
        load_pretrained_tpufpu_slim,
    )

    for loader in (load_pretrained_fpu, load_pretrained_deepfpu,
                   load_pretrained_tpufpu, load_pretrained_tpufpu_slim,
                   load_pretrained_tpufpu_nano):
        _, variables = loader(quant=True)
        assert "quant_stats" in variables, loader.__name__
        scales = jax.tree_util.tree_leaves(variables["quant_stats"])
        assert scales and all(float(s) > 0 for s in scales)


def test_bundled_model_int8_sir_parity():
    """The bundled trained FPU must enhance equally well through the int8
    path (within 1 dB blind SIR) on a held-out synthetic scene."""
    from azoom.eval.projection import sdr_sir
    from azoom.models.pretrained import load_pretrained_fpu
    from azoom.models.unet import FreqPreservingUNet
    from azoom.pipelines.learned import learned_enhance
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like

    model, variables = load_pretrained_fpu()
    model_q = FreqPreservingUNet(base=model.base, dtype=model.dtype, quant=True)
    N = 32_000
    k = jax.random.split(jax.random.PRNGKey(11), 3)
    sc = make_scene(
        speech_like(k[0], N, CFG.fs, 150.0),
        jnp.stack([
            speech_like(k[1], N, CFG.fs, 210.0),
            speech_like(k[2], N, CFG.fs, 120.0),
        ]),
        90.0, jnp.asarray([40.0, 130.0]), CFG.mic_dist, CFG.fs,
    )
    out_f = learned_enhance(sc["mixture"], model, variables, CFG)
    out_q = learned_enhance(sc["mixture"], model_q, variables, CFG)
    _, sir_f = sdr_sir(out_f, sc["target_ref"], sc["interference_ref"])
    _, sir_q = sdr_sir(out_q, sc["target_ref"], sc["interference_ref"])
    _, sir_in = sdr_sir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    assert float(sir_q) - float(sir_in) > 10.0
    assert abs(float(sir_q) - float(sir_f)) < 1.0, (float(sir_f), float(sir_q))
    assert np.isfinite(np.asarray(out_q)).all()

"""End-to-end oracle integration test.

The reference's central self-validation (SURVEY.md §4.1, readme.md:22-23):
run the full pipeline with a *perfect* (ground-truth-derived) mask; a
correct MVDR engine must then reach very high SIR (reference: 36.24 dB on
anechoic LJSpeech). We reproduce the same harness with synthetic
speech-like sources and assert a conservative threshold plus a large
improvement over the unprocessed mixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir, sir_improvement_db
from azoom.pipelines.oracle import heuristic_enhance, oracle_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig(mic_dist=0.04, sigma=1e-7)
N = 32_000  # 2 s


@pytest.fixture(scope="module")
def scene():
    sigs = speech_like_batch(jax.random.PRNGKey(7), 3, N, CFG.fs)
    return make_scene(
        target=sigs[0],
        interferers=sigs[1:],
        target_angle_deg=90.0,
        interferer_angles_deg=jnp.array([40.0, 130.0]),
        mic_dist=CFG.mic_dist,
        fs=CFG.fs,
    )


def test_oracle_sir_high(scene):
    out = oracle_enhance(
        scene["mixture"], scene["target_ref"], scene["interference_ref"], CFG
    )
    _, sir_out = osinr_osir(out, scene["target_ref"], scene["interference_ref"])
    _, sir_in = osinr_osir(
        scene["mixture"][0], scene["target_ref"], scene["interference_ref"]
    )
    sir_out, sir_in = float(sir_out), float(sir_in)
    # Reference achieves 36.24 dB with real speech; synthetic sources with an
    # oracle IBM + binary post-filter must clear 25 dB and a >=20 dB gain.
    assert sir_out > 25.0, f"oracle SIR too low: {sir_out:.2f} dB (in: {sir_in:.2f})"
    assert sir_out - sir_in > 20.0


def test_oracle_output_sane(scene):
    out = np.asarray(
        oracle_enhance(
            scene["mixture"], scene["target_ref"], scene["interference_ref"], CFG
        )
    )
    assert out.shape == (N,)
    assert np.isfinite(out).all()
    assert np.max(np.abs(out)) > 1e-4  # not silent


def test_oracle_irm_postfilter(scene):
    out = oracle_enhance(
        scene["mixture"],
        scene["target_ref"],
        scene["interference_ref"],
        CFG,
        post_filter="irm",
    )
    _, sir = osinr_osir(out, scene["target_ref"], scene["interference_ref"])
    # IRM is a soft gain — deliberately trades SIR for fewer artifacts, so
    # the bar is lower than the binary post-filter's.
    assert float(sir) > 12.0


def test_heuristic_improves_sir(scene):
    """The blind IPD mask is crude (~4.4 dB in the reference, readme.md:21)
    but must still improve over the raw mixture."""
    out = heuristic_enhance(scene["mixture"], CFG)
    imp = sir_improvement_db(
        out, scene["mixture"][0], scene["target_ref"], scene["interference_ref"]
    )
    assert float(imp) > 2.0


def test_oracle_batched(scene):
    """Leading batch dims broadcast through the whole pipeline — a batch of
    scenes is one XLA program."""
    mix = jnp.stack([scene["mixture"], scene["mixture"]])
    tgt = jnp.stack([scene["target_ref"], scene["target_ref"]])
    itf = jnp.stack([scene["interference_ref"], scene["interference_ref"]])
    out = oracle_enhance(mix, tgt, itf, CFG)
    assert out.shape == (2, N)
    single = oracle_enhance(
        scene["mixture"], scene["target_ref"], scene["interference_ref"], CFG
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)


def test_oracle_breaks_dof_limit_four_interferers():
    """A 2-mic array has M-1=1 spatial DoF, yet masked MVDR must still
    strongly suppress FOUR interferers (readme.md:19-23's central claim,
    BASELINE config 3: 'N-interferer mixtures breaking the M-1 DoF limit')."""
    sigs = speech_like_batch(jax.random.PRNGKey(17), 5, N, CFG.fs)
    sc = make_scene(
        target=sigs[0],
        interferers=sigs[1:],
        target_angle_deg=90.0,
        interferer_angles_deg=jnp.array([30.0, 60.0, 120.0, 150.0]),
        mic_dist=CFG.mic_dist,
        fs=CFG.fs,
    )
    out = oracle_enhance(
        sc["mixture"], sc["target_ref"], sc["interference_ref"], CFG
    )
    imp = sir_improvement_db(
        out, sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
    )
    assert float(imp) > 15.0, f"4-interferer oracle improvement {float(imp):.2f} dB"

"""BSS-eval tests: distortion-filter invariance (the property plain
projection lacks), interference sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.eval.bss import bss_eval_sources
from azoom.eval.projection import osinr_osir
from azoom.sim.signals import speech_like_batch

CFG = PipelineConfig()
N = 16_000


def _sources():
    return speech_like_batch(jax.random.PRNGKey(3), 2, N, CFG.fs)


def test_filtered_target_scores_high_sdr():
    """A delayed+filtered copy of the target must score high SDR under
    BSS-eval (the 512-tap allowance) even though plain projection drops."""
    srcs = _sources()
    tgt = np.asarray(srcs[0])
    h = np.array([0.0] * 7 + [0.9, 0.3, -0.1], np.float32)  # delay+coloring
    est = jnp.asarray(np.convolve(tgt, h)[:N])
    res = bss_eval_sources(srcs, est, filter_len=64)
    assert float(res["sdr"]) > 25.0, res
    assert float(res["sir"]) > 25.0
    # Plain projection punishes the delay/coloring by comparison.
    _, sir_proj = osinr_osir(est, srcs[0], srcs[1])
    assert float(res["sir"]) > float(sir_proj)


def test_mixture_scores_low_sir():
    srcs = _sources()
    est = srcs[0] + srcs[1]
    res = bss_eval_sources(srcs, est, filter_len=64)
    assert float(res["sir"]) < 15.0
    # And adding more interference lowers SIR further.
    res2 = bss_eval_sources(srcs, srcs[0] + 3.0 * srcs[1], filter_len=64)
    assert float(res2["sir"]) < float(res["sir"])


def test_clean_target_near_perfect():
    srcs = _sources()
    res = bss_eval_sources(srcs, srcs[0], filter_len=64)
    assert float(res["sdr"]) > 40.0
    assert float(res["sar"]) > 40.0


def test_explicit_target_index():
    """target_index is static; explicitly passing it (including nonzero)
    must work (round-1 ADVICE: traced index broke the Python slice)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    refs = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    est = refs[1] + 0.01 * jnp.asarray(rng.standard_normal(4096), jnp.float32)
    r = bss_eval_sources(refs, est, target_index=1, filter_len=64)
    assert float(r["sir"]) > 20.0
    r0 = bss_eval_sources(refs, est, target_index=0, filter_len=64)
    assert float(r0["sir"]) < float(r["sir"])

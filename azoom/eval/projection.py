"""Projection-based separation metrics (OSIR / OSINR / SDR / SIR).

TPU-native rebuild of the reference's two metric formulations:

  * ``calculate_osnr_osir`` (Final_pipeline/src/metrics.py:102-123,
    scripts/eval.py:112-144): normalize the *references* to unit energy,
    project the raw output onto the target / interference directions, call
    the residual noise+artifacts.
  * ``calculate_metrics_manual`` (scripts/run_metrics.py:6-35,
    full_audio_generating_pipeline/inference.py:77-86): additionally
    normalize the output itself; reports (SDR, SIR).

Both are pure projections, so they vectorize over arbitrary leading batch
dimensions and run on device — a sharded batch sweep scores thousands of
mixtures in one XLA program (the reference loops `evaluate_run` per scene,
batch_run.py:41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["osinr_osir", "sdr_sir", "sir_improvement_db"]

_EPS = 1e-10


def _unit(x: jnp.ndarray) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS)


@jax.jit
def osinr_osir(
    output: jnp.ndarray, target_ref: jnp.ndarray, interference_ref: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Output SINR and SIR in dB via signal projection.

    Args:
      output: (..., n) enhanced (or mixture channel-0) signal.
      target_ref / interference_ref: (..., n) ground-truth stems.

    Returns:
      (osinr_db, osir_db), each shaped (...,).

    Matches Final_pipeline/src/metrics.py:102-123: references are
    unit-normalized, the output is not (the projections are scale-covariant
    so the ratios match either way).
    """
    t = _unit(target_ref.astype(jnp.float32))
    i = _unit(interference_ref.astype(jnp.float32))
    y = output.astype(jnp.float32)

    alpha = jnp.sum(y * t, axis=-1, keepdims=True)
    beta = jnp.sum(y * i, axis=-1, keepdims=True)
    e_t = alpha * t
    e_i = beta * i
    e_n = y - e_t - e_i

    P_t = jnp.sum(e_t**2, axis=-1)
    P_i = jnp.sum(e_i**2, axis=-1)
    P_n = jnp.sum(e_n**2, axis=-1)

    osinr = 10.0 * jnp.log10(P_t / (P_i + P_n + _EPS) + _EPS)
    osir = 10.0 * jnp.log10(P_t / (P_i + _EPS) + _EPS)
    return osinr, osir


@jax.jit
def sdr_sir(
    output: jnp.ndarray, target_ref: jnp.ndarray, interference_ref: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(SDR, SIR) in dB — the run_metrics.py:6-35 variant (output also
    unit-normalized; SDR counts interference + artifacts as distortion)."""
    y = _unit(output.astype(jnp.float32))
    t = _unit(target_ref.astype(jnp.float32))
    i = _unit(interference_ref.astype(jnp.float32))

    e_t = jnp.sum(y * t, axis=-1, keepdims=True) * t
    e_i = jnp.sum(y * i, axis=-1, keepdims=True) * i
    e_a = y - e_t - e_i

    P_t = jnp.sum(e_t**2, axis=-1)
    P_i = jnp.sum(e_i**2, axis=-1) + _EPS
    P_a = jnp.sum(e_a**2, axis=-1) + _EPS

    sir = 10.0 * jnp.log10(P_t / P_i + _EPS)
    sdr = 10.0 * jnp.log10(P_t / (P_i + P_a) + _EPS)
    return sdr, sir


def sir_improvement_db(
    enhanced: jnp.ndarray,
    mixture_ch0: jnp.ndarray,
    target_ref: jnp.ndarray,
    interference_ref: jnp.ndarray,
) -> jnp.ndarray:
    """SIR(enhanced) - SIR(mixture) — the headline number of every
    reference report (metrics.py:148-155: input metrics from mixture ch 0,
    output metrics from the enhanced mono signal)."""
    _, sir_out = osinr_osir(enhanced, target_ref, interference_ref)
    _, sir_in = osinr_osir(mixture_ch0, target_ref, interference_ref)
    return sir_out - sir_in

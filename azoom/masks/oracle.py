"""Oracle masks derived from ground-truth stems (the simulator's "answer key").

TPU-native equivalents of:
  * Ideal Binary Mask:  rt_av_zoom/core/oracle_debug.py:49-53
  * reverb-aware IBM:   rt_av_zoom/core/oracle_reverb.py:81-88
  * Ideal Ratio Mask:   rt_av_zoom/core/oracle_reverb.py:140-156
  * training label:     full_audio_generating_pipeline/model_training.py:90

Mask convention: ``1.0 = noise/interference dominated`` for noise masks fed
to covariance estimation, ``1.0 = target dominated`` for target masks used
as post-filters. Helpers return the *noise* mask; ``1 - mask`` gives the
target mask (oracle_debug.py:84).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ibm_noise_mask", "ibm_target_mask", "irm_target_mask", "wiener_target_mask"]


def ibm_noise_mask(S_tgt: jnp.ndarray, S_int: jnp.ndarray) -> jnp.ndarray:
    """Ideal Binary Mask, 1 where interference dominates: |S_int| > |S_tgt|."""
    return jnp.where(jnp.abs(S_int) > jnp.abs(S_tgt), 1.0, 0.0).astype(jnp.float32)


def ibm_target_mask(S_tgt: jnp.ndarray, S_int: jnp.ndarray) -> jnp.ndarray:
    """Ideal Binary Mask, 1 where target dominates (the training label)."""
    return jnp.where(jnp.abs(S_tgt) > jnp.abs(S_int), 1.0, 0.0).astype(jnp.float32)


def irm_target_mask(
    S_tgt: jnp.ndarray, S_int: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Ideal Ratio Mask sqrt(P_t / (P_t + P_i)) — soft post-filter that keeps
    more signal texture (oracle_reverb.py:148-150)."""
    P_t = jnp.abs(S_tgt) ** 2
    P_i = jnp.abs(S_int) ** 2
    return jnp.sqrt(P_t / (P_t + P_i + eps)).astype(jnp.float32)


def wiener_target_mask(
    S_tgt: jnp.ndarray, S_int: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Wiener gain P_t / (P_t + P_i) — squared-IRM variant."""
    P_t = jnp.abs(S_tgt) ** 2
    P_i = jnp.abs(S_int) ** 2
    return (P_t / (P_t + P_i + eps)).astype(jnp.float32)

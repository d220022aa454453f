"""Spectral post-filters beyond plain mask multiplication.

The harmonic-regeneration post-filter (reference roadmap TODO:9) lives in
:mod:`azoom.beam.postfilter` — that implementation is the canonical one,
wired into ``learned_enhance(harmonic_regen=True)`` with a minimum-
statistics noise tracker and the re-open-only gain bracket; it is
re-exported here for compatibility. ``spectral_floor`` is the stage-1
floored mask multiply (full_audio_generating_pipeline/inference.py:116).
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.postfilter import harmonic_regeneration

__all__ = ["harmonic_regeneration", "spectral_floor"]


def spectral_floor(S: jnp.ndarray, mask: jnp.ndarray, floor: float = 0.05) -> jnp.ndarray:
    """Floored mask application — max(mask, floor) * S
    (full_audio_generating_pipeline/inference.py:116)."""
    return S * jnp.maximum(mask, floor)

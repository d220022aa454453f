"""Analysis/synthesis windows.

Matches scipy.signal.get_window('hann', N) (periodic / fftbins=True), which is
what scipy.signal.stft uses by default — and therefore what all four
generations of the reference pipeline use (e.g.
/root/reference/rt_av_zoom/core/masked_mvdr.py:76).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hann(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window of length n."""
    k = jnp.arange(n, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / n)


def hann_np(n: int) -> np.ndarray:
    """NumPy twin of :func:`hann` for host-side setup code."""
    k = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)


def check_nola(window: np.ndarray, hop: int, tol: float = 1e-10) -> bool:
    """Nonzero-overlap-add constraint check for iSTFT invertibility."""
    n = len(window)
    if hop > n:
        return False
    binsums = np.zeros(hop)
    for i in range(0, n, hop):
        seg = window[i : i + hop] ** 2
        binsums[: len(seg)] += seg
    return bool(np.min(binsums) > tol * np.max(binsums))

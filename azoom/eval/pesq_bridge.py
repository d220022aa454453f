"""Optional host-side PESQ bridge.

PESQ is an ITU-T C implementation with no JAX port; the reference keeps it
as an optional dependency behind a guard (Final_pipeline/src/metrics.py:
8-14, "PESQ library not found. Install with: pip install pesq"). Same
policy here: if the ``pesq`` package exists it is used on host; otherwise
scores come back as None and every caller degrades gracefully. Device
pipelines never depend on this module.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment-dependent
    from pesq import pesq as _pesq

    PESQ_AVAILABLE = True
except ImportError:  # pragma: no cover
    _pesq = None
    PESQ_AVAILABLE = False

__all__ = ["PESQ_AVAILABLE", "pesq_scores"]


def pesq_scores(
    ref: np.ndarray, deg: np.ndarray, fs: int
) -> tuple[float | None, float | None]:
    """(narrowband, wideband) PESQ, or (None, None) when unavailable.

    Mirrors PESQEvaluator.evaluate (metrics.py:48-66): NB at 8/16 kHz, WB
    only at 16 kHz; errors are swallowed into None.
    """
    if not PESQ_AVAILABLE:
        return None, None
    nb = wb = None
    ref = np.asarray(ref, np.float32)
    deg = np.asarray(deg, np.float32)
    n = min(len(ref), len(deg))
    try:
        if fs in (8_000, 16_000):
            nb = float(_pesq(fs, ref[:n], deg[:n], "nb"))
        if fs == 16_000:
            wb = float(_pesq(fs, ref[:n], deg[:n], "wb"))
    except Exception as e:  # noqa: BLE001 - parity with reference guard
        print(f"PESQ Error: {e}")
    return nb, wb

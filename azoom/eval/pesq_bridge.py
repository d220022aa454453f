"""Host-side PESQ with a native fallback.

The reference keeps PESQ as an optional dependency behind a guard
(Final_pipeline/src/metrics.py:8-14, "PESQ library not found. Install
with: pip install pesq"). Here the policy is stronger: if the ``pesq``
package (the ITU C extension) exists it is used; otherwise scoring falls
back to the from-scratch :mod:`azoom.eval.pesq_native` implementation so
the framework always has perceptual-quality capability. ``PESQ_BACKEND``
records which one produced the numbers ("itu" / "native"); the native
estimator's conformance caveats are documented in its module docstring.
Device pipelines never depend on this module.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment-dependent
    from pesq import pesq as _pesq

    PESQ_BACKEND = "itu"
except ImportError:  # pragma: no cover
    from azoom.eval.pesq_native import pesq_native as _pesq

    PESQ_BACKEND = "native"

PESQ_AVAILABLE = True  # always: the native fallback is built in

__all__ = ["PESQ_AVAILABLE", "PESQ_BACKEND", "pesq_scores"]


def pesq_scores(
    ref: np.ndarray, deg: np.ndarray, fs: int
) -> tuple[float | None, float | None]:
    """(narrowband, wideband) MOS-LQO, or None per mode when inapplicable.

    Mirrors PESQEvaluator.evaluate (metrics.py:48-66): NB at 8/16 kHz, WB
    only at 16 kHz; errors are swallowed into None.
    """
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

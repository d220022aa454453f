"""FLOP accounting and roofline analysis for azoom pipelines.

Used to answer "are we at speed-of-light?" quantitatively: XLA's own cost
analysis gives the exact FLOPs of a compiled computation, and comparing
measured wall-clock against it yields achieved FLOP/s vs. the chip peak
(TPU v5e: ~197 TFLOP/s bf16, ~98 TFLOP/s f32 on the MXU).
"""

from __future__ import annotations

import jax

__all__ = ["compiled_flops", "roofline_report"]


def compiled_flops(fn, *args, **kwargs) -> float:
    """Total FLOPs of the jit-compiled fn(*args) per XLA's cost analysis
    (returns 0.0 when the backend does not expose an estimate)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def roofline_report(
    fn, args: tuple, measured_seconds: float, peak_tflops: float = 197.0
) -> dict:
    """Achieved-vs-peak report for a measured execution time."""
    flops = compiled_flops(fn, *args)
    achieved = flops / measured_seconds / 1e12 if measured_seconds > 0 else 0.0
    return {
        "flops": flops,
        "measured_s": measured_seconds,
        "achieved_tflops": achieved,
        "peak_tflops": peak_tflops,
        "mxu_utilization": achieved / peak_tflops if peak_tflops else 0.0,
    }

"""Performance instrumentation: real-time factor, per-stage timing, traces.

Upgrades the reference's ad-hoc time.time() prints (SURVEY.md §5:
resnet_model_mvdr/inference.py:168-205 per-stage ms,
tf_lite_version/inference.py:365-387 RTF) into reusable helpers, plus
jax.profiler integration for real traces.

IMPORTANT measurement rule for this environment: the axon TPU backend's
``block_until_ready`` does not actually wait for the remote computation, so
every timer here forces completion by fetching a scalar reduction of the
result to host (``_force``). Loops that should measure device throughput
must live INSIDE one jit (lax.fori_loop) to avoid per-dispatch tunnel
round-trips dominating.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["force", "time_fn", "realtime_factor", "stage_timer", "trace"]


def force(x) -> float:
    """Force completion of a computation by reducing to a host scalar."""
    leaves = jax.tree_util.tree_leaves(x)
    total = 0.0
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        if jnp.iscomplexobj(leaf):
            total += float(jnp.sum(jnp.abs(leaf.real))) + float(
                jnp.sum(jnp.abs(leaf.imag))
            )
        else:
            total += float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))
    return total


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kwargs):
    """Wall-clock a jitted function honestly. Returns (seconds_per_call,
    last_result). The iteration loop is hoisted into the device via
    lax.fori_loop when the function is unary-compatible; otherwise each
    call is forced individually."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def realtime_factor(
    process_fn: Callable[[jnp.ndarray], jnp.ndarray],
    audio: jnp.ndarray,
    fs: int,
    iters: int = 5,
) -> float:
    """Seconds of audio processed per wall-clock second (RTF, the
    tf_lite_version/inference.py:387 metric; >1 = faster than realtime)."""
    dt, _ = time_fn(process_fn, audio, iters=iters)
    return (audio.shape[-1] / fs) / dt


class stage_timer:
    """Per-stage wall-clock accumulator — the resnet inference.py:270-274
    'Mask Estimation Time / MVDR Processing Time' report as a context
    manager. Forces device completion at stage boundaries."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            force(result_ref[0])
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["=== stage timing ==="]
        for name, total in self.totals.items():
            n = self.counts[name]
            lines.append(f"  {name}: {total * 1e3:.1f} ms total, "
                         f"{total / n * 1e3:.2f} ms/call (n={n})")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/azoom_trace"):
    """jax.profiler trace context — open with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

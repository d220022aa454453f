"""Multi-host (DCN) scale-out helpers.

SURVEY.md §2.4 / §5: the reference has no distributed execution at all; the
TPU-native design uses ICI collectives within a pod slice (azoom.parallel.
mesh/sweep — already exercised on virtual devices) and DCN only for
*sweep farming* across hosts, where scenes are embarrassingly parallel.

This module is the thin multi-host entry layer:

  * :func:`initialize` wraps ``jax.distributed.initialize`` (coordinator
    address + process indices; no-ops on single-process runs so the same
    script works everywhere),
  * :func:`global_data_mesh` builds a 1-D 'data' mesh over ALL global
    devices — with jit's standard SPMD semantics, the same
    ``sharded_sweep`` / ``make_train_step(mesh)`` code then spans hosts,
    gradients and metric gathers riding DCN between slices and ICI within
    them,
  * :func:`host_shard` gives each process its slice of a host-partitioned
    work list (e.g. run indices for per-run file sweeps).

Single-host environments (like this one) can only exercise the no-op and
virtual-device paths; the API is the standard JAX multi-process recipe, so
a real pod deployment needs no code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "global_data_mesh", "host_shard", "is_primary"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-process JAX runtime. No-op when unconfigured (single
    process) so scripts run unchanged on one host."""
    if coordinator_address is None and num_processes is None:
        return  # single-process; jax.process_count() == 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device of every process (DCN + ICI)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_shard(n_items: int) -> range:
    """This process's contiguous slice of [0, n_items) — for host-side
    (file-producing) sweep farming where each host owns a run range."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_items // np_)
    return range(p * per, min((p + 1) * per, n_items))


def is_primary() -> bool:
    return jax.process_index() == 0

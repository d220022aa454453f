"""Device-mesh construction and sharding helpers.

The reference has no multi-device anything (SURVEY.md §2.3-2.4: one Python
process, serial loops). Scale-out here is first-class JAX SPMD: pick a
mesh, annotate shardings, let XLA insert the ICI collectives.

Axes:
  * 'data'  — scenes / batch entries (the batch_run.py loop, parallelized)
  * 'chunk' — streaming chunk axis of a single long recording (sequence
    parallelism: each device owns a contiguous run of 2 s windows)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]

P = PartitionSpec


def make_mesh(
    n_devices: int | None = None, axis_name: str = "data", devices=None
) -> Mesh:
    """1-D mesh over the first n available devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

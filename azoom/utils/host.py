"""Host transfer helpers.

The axon TPU backend in this environment cannot transfer complex arrays
device->host directly (UNIMPLEMENTED); real/imag parts transfer fine. All
host-side consumers (WAV writers, reports, plots) go through
:func:`to_numpy`, which splits complex arrays into two real transfers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["to_numpy"]


def to_numpy(x) -> np.ndarray:
    """Device array -> numpy, robust to complex dtypes on backends that
    cannot DMA complex buffers to host."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)

"""Sliding-window streaming runtime (chunked overlap-add).

TPU-native rebuild of the reference's "real-time" execution model
(Final_pipeline/src/inference.py:171-233,
full_audio_generating_pipeline/inference.py:134-156): slide a 2.0 s window
with 50 % hop over arbitrary-length audio; process each chunk
independently; accumulate into an output buffer with a normalization
counter.

The reference iterates chunks in a Python ``for`` loop. Here the chunk
axis is a *batch* axis: all chunks are framed into one array and the chunk
processor is ``vmap``-ed over them, so a 10-minute file is one XLA program
and chunks land on the MXU/VPU together. (Chunks are embarrassingly
parallel because each chunk's covariance is chunk-local — SURVEY.md §5.)
For multi-chip scale-out the same chunk axis is sharded over a device mesh
(azoom.parallel).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "chunk_signal",
    "overlap_add_chunks",
    "streaming_enhance",
    "streaming_enhance_sharded",
]


def chunk_signal(x: jnp.ndarray, win_size: int, hop: int) -> tuple[jnp.ndarray, int]:
    """Frame x (..., n) into overlapping chunks (n_chunks, ..., win_size).

    The tail is zero-padded to a whole number of hops (the reference pads
    the final short chunk, Final inference.py:193-196). Returns
    (chunks, n_orig) with the chunk axis LEADING so it can be sharded.
    """
    n = x.shape[-1]
    n_chunks = max(1, -(-(max(n - win_size, 0)) // hop) + 1)
    padded = (n_chunks - 1) * hop + win_size
    widths = [(0, 0)] * (x.ndim - 1) + [(0, padded - n)]
    xp = jnp.pad(x, widths)
    starts = jnp.arange(n_chunks) * hop
    chunks = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(xp, s, win_size, axis=-1)
    )(starts)
    return chunks, n


def overlap_add_chunks(
    chunks: jnp.ndarray, hop: int, length: int, window: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Overlap-add processed chunks (n_chunks, ..., win_size) -> (..., length).

    Normalizes by the accumulated window sum — the reference's
    ``out_buf / np.maximum(norm_buf, 1e-10)`` pattern with a rectangular
    window of ones (Final inference.py:225-232); pass a taper ``window``
    for smoother seams.
    """
    n_chunks, *lead, win_size = chunks.shape
    if window is None:
        window = jnp.ones((win_size,), chunks.dtype)
    out_len = (n_chunks - 1) * hop + win_size

    wchunks = chunks * window
    starts = jnp.arange(n_chunks) * hop

    def body(carry, inp):
        out, norm = carry
        s, ch = inp
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, s, win_size, axis=-1) + ch,
            s, axis=-1,
        )
        norm = jax.lax.dynamic_update_slice_in_dim(
            norm,
            jax.lax.dynamic_slice_in_dim(norm, s, win_size, axis=-1) + window,
            s, axis=-1,
        )
        return (out, norm), None

    out0 = jnp.zeros((*lead, out_len), chunks.dtype)
    norm0 = jnp.zeros((out_len,), chunks.dtype)
    (out, norm), _ = jax.lax.scan(body, (out0, norm0), (starts, wchunks))
    out = out / jnp.maximum(norm, 1e-10)
    return out[..., :length]


@functools.partial(jax.jit, static_argnames=("process_fn", "win_size", "hop"))
def streaming_enhance(
    mixture: jnp.ndarray,
    process_fn: Callable[[jnp.ndarray], jnp.ndarray],
    win_size: int = 32_000,
    hop: int = 16_000,
) -> jnp.ndarray:
    """Process arbitrary-length multichannel audio chunk-by-chunk.

    Args:
      mixture: (M, n) time-domain input.
      process_fn: (M, win_size) -> (win_size,) chunk enhancer (e.g. a
        closed-over oracle/learned-mask MVDR pass). Must be jittable.
      win_size / hop: window and hop in samples (2 s / 50 % by default,
        Final_pipeline/src/config.py:18-19).

    Returns:
      (n,) enhanced mono signal, same length as the input.
    """
    chunks, n = chunk_signal(mixture, win_size, hop)  # (C, M, W)
    processed = jax.vmap(process_fn)(chunks)  # (C, W)
    return overlap_add_chunks(processed, hop, n)


def streaming_enhance_sharded(
    mixture: jnp.ndarray,
    process_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mesh,
    win_size: int = 32_000,
    hop: int = 16_000,
    axis_name: str = "chunk",
) -> jnp.ndarray:
    """Sequence-parallel streaming: the chunk axis of ONE long recording is
    sharded over the mesh, so each device enhances a contiguous run of 2 s
    windows (SURVEY.md §5's "sequence parallelism to generalize on TPU").
    Each chunk already carries its window's overlap (the 50% OLA hop), so
    no explicit halo exchange is needed beyond the sharded framing; the
    final overlap-add gathers device results.

    Produces outputs identical to :func:`streaming_enhance` (chunk
    covariances are chunk-local).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    chunks, n = chunk_signal(mixture, win_size, hop)
    pad = (-chunks.shape[0]) % mesh.devices.size
    if pad:
        chunks = jnp.concatenate(
            [chunks, jnp.zeros((pad,) + chunks.shape[1:], chunks.dtype)]
        )
    chunks = jax.device_put(chunks, NamedSharding(mesh, P(axis_name)))
    processed = jax.jit(jax.vmap(process_fn))(chunks)
    if pad:
        processed = processed[:-pad]
    return overlap_add_chunks(processed, hop, n)

"""Shoebox room acoustics: image-source RIRs, fully vectorized in JAX.

TPU-native replacement for the pyroomacoustics C++ engine the reference
delegates to (Final_pipeline/src/simulation.py:105-144,
rt_av_zoom/core/world.py:123-180). Implements the classical Allen-Berkley
image-source model for a rectangular ("shoebox") room:

  * image positions: x_img[d] = (-1)^q_d * s_d + 2 n_d L_d for integer
    reflection orders n in [-N, N]^3 and parities q in {0,1}^3,
  * per-image amplitude beta^(reflection count) / (4 pi dist),
  * RIR accumulation by K-tap Hann-windowed-sinc fractional delay
    (pyroomacoustics likewise band-limits each image's delta),
  * Sabine's law inversion RT60 -> uniform wall absorption
    (pra.inverse_sabine, simulation.py:108).

The whole image lattice for all (source, mic) pairs is one vectorized
program: distances and amplitudes are dense (I,)-shaped math; the only
irregular op is the final scatter-add into the RIR buffer, batched via
``.at[].add``. max_order=15 (the reference's setting, simulation.py:111)
yields ~240k images — trivial device work, generated in milliseconds rather
than pyroomacoustics' per-scene C++ walk on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["inverse_sabine", "shoebox_rir", "rir_matrix", "fft_convolve"]


def inverse_sabine(rt60: float, room_dim) -> float:
    """Uniform energy absorption from a target RT60 via Sabine's formula
    (the model behind pra.inverse_sabine): a = 0.1611 * V / (S * RT60)."""
    L = np.asarray(room_dim, dtype=np.float64)
    V = float(np.prod(L))
    S = 2.0 * float(L[0] * L[1] + L[0] * L[2] + L[1] * L[2])
    sab = 0.1611 * V / (S * rt60)
    return float(min(sab, 0.9999))


def _image_lattice(max_order: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (host) part: integer orders n (I, 3), parities q (I, 3), and
    per-image reflection counts (I,). Restricted to images whose total
    reflection count <= max_order (the usual ISM truncation)."""
    rng = np.arange(-max_order, max_order + 1)
    n = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    q = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(-1, 3)
    n = np.repeat(n, 8, axis=0)
    q = np.tile(q, ((2 * max_order + 1) ** 3, 1))
    # Reflection count per axis: |n - q| + |n| (Allen & Berkley 1979).
    refl = np.abs(n - q).sum(-1) + np.abs(n).sum(-1)
    keep = refl <= max_order
    return n[keep], q[keep], refl[keep]


@functools.partial(
    jax.jit,
    static_argnames=("max_order", "rir_length", "fs", "n_taps"),
)
def _rir_from_lattice(
    source: jnp.ndarray,
    mic: jnp.ndarray,
    room_dim: jnp.ndarray,
    beta: jnp.ndarray,
    n_lat: jnp.ndarray,
    q_lat: jnp.ndarray,
    refl: jnp.ndarray,
    max_order: int,
    rir_length: int,
    fs: int,
    n_taps: int,
    c: float = 343.0,
) -> jnp.ndarray:
    img = (1.0 - 2.0 * q_lat) * source + 2.0 * n_lat * room_dim  # (I, 3)
    dist = jnp.linalg.norm(img - mic, axis=-1)  # (I,)
    amp = beta**refl / (4.0 * jnp.pi * jnp.maximum(dist, 1e-2))
    delay = dist / c * fs  # samples, fractional

    # K-tap windowed-sinc fractional delta at each delay.
    k = jnp.arange(n_taps, dtype=jnp.float32) - (n_taps // 2)
    base = jnp.floor(delay).astype(jnp.int32)
    frac = delay - base
    t = k[None, :] - frac[:, None]  # (I, K)
    sinc = jnp.sinc(t)
    win = 0.5 + 0.5 * jnp.cos(2.0 * jnp.pi * t / n_taps)  # Hann taper
    taps = sinc * jnp.maximum(win, 0.0) * amp[:, None]
    idx = base[:, None] + k[None, :].astype(jnp.int32)
    valid = (idx >= 0) & (idx < rir_length)
    idx = jnp.clip(idx, 0, rir_length - 1)
    rir = jnp.zeros((rir_length,), jnp.float32)
    return rir.at[idx.reshape(-1)].add(
        jnp.where(valid, taps, 0.0).reshape(-1), mode="drop"
    )


def shoebox_rir(
    source,
    mic,
    room_dim,
    absorption: float,
    max_order: int = 15,
    fs: int = 16_000,
    rir_length: int | None = None,
    n_taps: int = 16,
    c: float = 343.0,
) -> jnp.ndarray:
    """RIR between one source and one mic in a shoebox room.

    Args:
      source / mic: (3,) positions in meters.
      absorption: uniform wall energy absorption (from :func:`inverse_sabine`).
      max_order: image reflection order (reference uses 15, simulation.py:111;
        0 = anechoic direct path only).
      rir_length: output taps; default covers the longest image path.

    Returns: (rir_length,) float32 impulse response.
    """
    n_lat, q_lat, refl = _image_lattice(max_order)
    room_dim = jnp.asarray(room_dim, jnp.float32)
    if rir_length is None:
        # Longest possible path in the truncated lattice.
        diag = float(np.linalg.norm(np.asarray(room_dim, np.float64)))
        max_dist = (2 * max_order + 1) * diag
        rir_length = int(max_dist / c * fs) + n_taps + 1
    beta = jnp.sqrt(jnp.maximum(1.0 - absorption, 0.0)).astype(jnp.float32)
    return _rir_from_lattice(
        jnp.asarray(source, jnp.float32),
        jnp.asarray(mic, jnp.float32),
        room_dim,
        beta,
        jnp.asarray(n_lat, jnp.float32),
        jnp.asarray(q_lat, jnp.float32),
        jnp.asarray(refl, jnp.float32),
        max_order,
        int(rir_length),
        fs,
        n_taps,
        c,
    )


def rir_matrix(
    sources,
    mics,
    room_dim,
    absorption: float,
    max_order: int = 15,
    fs: int = 16_000,
    rir_length: int | None = None,
    n_taps: int = 16,
    c: float = 343.0,
) -> jnp.ndarray:
    """RIRs for all (source, mic) pairs: (S, M, rir_length) — the
    room.rir[mic][src] table (simulation.py:140-165), vmapped."""
    sources = jnp.asarray(sources, jnp.float32)
    mics = jnp.asarray(mics, jnp.float32)
    if rir_length is None:
        diag = float(np.linalg.norm(np.asarray(room_dim, np.float64)))
        rir_length = int((2 * max_order + 1) * diag / c * fs) + n_taps + 1

    def one(s, m):
        return shoebox_rir(
            s, m, room_dim, absorption, max_order, fs, rir_length, n_taps, c
        )

    return jax.vmap(lambda s: jax.vmap(lambda m: one(s, m))(mics))(sources)


@functools.partial(jax.jit, static_argnames=("out_length",))
def fft_convolve(x: jnp.ndarray, h: jnp.ndarray, out_length: int) -> jnp.ndarray:
    """Linear convolution via FFT, cropped to out_length — the
    scipy.signal.fftconvolve(mode='full')[:n] idiom (simulation.py:143-144).
    Broadcasts over leading dims of x and h."""
    n = x.shape[-1] + h.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    H = jnp.fft.rfft(h, n=nfft, axis=-1)
    y = jnp.fft.irfft(X * H, n=nfft, axis=-1)
    return y[..., :out_length]

"""STOI (Short-Time Objective Intelligibility, Taal et al. 2010) in JAX.

The reference scores intelligibility with the ``pystoi`` package
(Final_pipeline/src/metrics.py:157, scripts/eval.py:19-71); that package is
unavailable here, so the algorithm is implemented natively — and being pure
math it runs on device, so a batch sweep scores STOI for thousands of
mixtures inside the same XLA program as the enhancement itself.

Algorithm (classic STOI): resample to 10 kHz; 256-pt Hann frames, hop 128,
512-pt FFT; discard frames more than 40 dB below the loudest clean frame;
15 one-third-octave band envelopes (150 Hz * 2^(k/3)); length-30 segments;
normalize + clip the degraded segment at -15 dB SDR; per-band per-segment
correlation, averaged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stoi"]

FS_STOI = 10_000
FRAME = 256
HOP = 128
NFFT = 512
N_BANDS = 15
MIN_FREQ = 150.0
SEG = 30  # frames per segment (384 ms)
BETA_DB = -15.0
DYN_RANGE_DB = 40.0


def _third_octave_matrix() -> np.ndarray:
    """(N_BANDS, NFFT//2+1) binary band-membership matrix (host constant)."""
    f = np.linspace(0, FS_STOI / 2, NFFT // 2 + 1)
    cf = MIN_FREQ * 2.0 ** (np.arange(N_BANDS) / 3.0)
    lo = cf / 2.0 ** (1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    H = ((f[None, :] >= lo[:, None]) & (f[None, :] < hi[:, None])).astype(np.float32)
    return H


_OCT = _third_octave_matrix()


def _fft_resample(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """FFT-domain resampling (scipy.signal.resample equivalent)."""
    n_in = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    n_keep = min(n_in // 2 + 1, n_out // 2 + 1)
    Xr = jnp.zeros(x.shape[:-1] + (n_out // 2 + 1,), X.dtype)
    Xr = Xr.at[..., :n_keep].set(X[..., :n_keep])
    return jnp.fft.irfft(Xr, n=n_out, axis=-1) * (n_out / n_in)


def _frames(x: jnp.ndarray) -> jnp.ndarray:
    """(n,) -> (T, FRAME) Hann-windowed frames."""
    n = x.shape[-1]
    T = (n - FRAME) // HOP + 1
    idx = jnp.arange(T)[:, None] * HOP + jnp.arange(FRAME)[None, :]
    win = jnp.asarray(np.hanning(FRAME + 2)[1:-1], jnp.float32)
    return x[idx] * win


@functools.partial(jax.jit, static_argnames=("fs",))
def stoi(clean: jnp.ndarray, degraded: jnp.ndarray, fs: int = 16_000) -> jnp.ndarray:
    """STOI score in (0, 1). clean/degraded: (n,) at sample rate fs.

    Silent-frame removal is implemented as masked statistics (soft
    exclusion) so shapes stay static under jit; for typical speech this
    matches list-based removal closely.
    """
    n10 = int(clean.shape[-1] * FS_STOI / fs)
    x = _fft_resample(clean.astype(jnp.float32), n10)
    y = _fft_resample(degraded.astype(jnp.float32), n10)

    xf = _frames(x)  # (T, FRAME)
    yf = _frames(y)

    # Active-frame mask from the clean signal (40 dB dynamic range).
    energy_db = 20.0 * jnp.log10(jnp.linalg.norm(xf, axis=-1) + 1e-10)
    active = energy_db > (jnp.max(energy_db) - DYN_RANGE_DB)  # (T,)

    X = jnp.abs(jnp.fft.rfft(xf, n=NFFT, axis=-1))  # (T, F)
    Yf = jnp.abs(jnp.fft.rfft(yf, n=NFFT, axis=-1))
    Hoct = jnp.asarray(_OCT)
    Xb = jnp.sqrt(jnp.einsum("bf,tf->tb", Hoct, X**2) + 1e-12)  # (T, B)
    Yb = jnp.sqrt(jnp.einsum("bf,tf->tb", Hoct, Yf**2) + 1e-12)

    T = Xb.shape[0]
    n_seg = T - SEG + 1
    seg_idx = jnp.arange(n_seg)[:, None] + jnp.arange(SEG)[None, :]  # (S, SEG)
    Xs = Xb[seg_idx]  # (S, SEG, B)
    Ys = Yb[seg_idx]
    # A segment is scored only if all its frames are active.
    seg_ok = jnp.all(active[seg_idx], axis=-1)  # (S,)

    alpha = jnp.linalg.norm(Xs, axis=1, keepdims=True) / (
        jnp.linalg.norm(Ys, axis=1, keepdims=True) + 1e-10
    )
    clip = 10.0 ** (-BETA_DB / 20.0)
    Yn = jnp.minimum(alpha * Ys, Xs * (1.0 + clip))

    Xm = Xs - jnp.mean(Xs, axis=1, keepdims=True)
    Ym = Yn - jnp.mean(Yn, axis=1, keepdims=True)
    corr = jnp.sum(Xm * Ym, axis=1) / (
        jnp.linalg.norm(Xm, axis=1) * jnp.linalg.norm(Ym, axis=1) + 1e-10
    )  # (S, B)
    w = seg_ok.astype(jnp.float32)
    return jnp.sum(jnp.mean(corr, axis=-1) * w) / (jnp.sum(w) + 1e-10)

"""Sample-rate conversion.

The reference resamples every corpus file to 16 kHz through librosa
(world.py:75, simulation.py:95 ``librosa.load(..., sr=FS)``); librosa is
unavailable here and its numba kernels would be the wrong tool anyway.
Two TPU-friendly implementations:

  * :func:`resample_fft` — FFT-domain (scipy.signal.resample semantics):
    exact for band-limited signals, one rfft/irfft pair, ideal on device.
  * :func:`resample_poly` — windowed-sinc polyphase (scipy
    resample_poly-like), expressed as a strided conv — streams, and avoids
    the FFT's circular-boundary assumption for non-periodic audio.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_fft", "resample_poly"]


@functools.partial(jax.jit, static_argnames=("n_out",))
def resample_fft(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Resample (..., n) -> (..., n_out) in the frequency domain."""
    n_in = x.shape[-1]
    X = jnp.fft.rfft(x, axis=-1)
    n_keep = min(n_in // 2 + 1, n_out // 2 + 1)
    Xr = jnp.zeros(x.shape[:-1] + (n_out // 2 + 1,), X.dtype)
    Xr = Xr.at[..., :n_keep].set(X[..., :n_keep])
    return jnp.fft.irfft(Xr, n=n_out, axis=-1) * (n_out / n_in)


def _design_lowpass(up: int, down: int, half_taps: int = 32) -> np.ndarray:
    """Kaiser-windowed sinc low-pass at min(1/up, 1/down) of Nyquist."""
    cutoff = 1.0 / max(up, down)
    n = 2 * half_taps * max(up, down) + 1
    k = np.arange(n) - n // 2
    h = cutoff * np.sinc(cutoff * k) * np.kaiser(n, 8.0)
    return (h / h.sum() * up).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Polyphase rational resampling (..., n) -> (..., ceil(n*up/down)).

    16 kHz -> 10 kHz (the STOI path) is up=5, down=8.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h = jnp.asarray(_design_lowpass(up, down))
    n = x.shape[-1]
    lead = x.shape[:-1]
    # Upsample by zero stuffing, filter, then decimate — written as one
    # conv with input dilation so XLA lowers it efficiently.
    xb = x.reshape((-1, 1, n)).astype(jnp.float32)
    n_out = -(-n * up // down)
    pad = (len(h) - 1) // 2
    # Right padding sized so the strided conv emits AT LEAST n_out
    # samples: the symmetric (pad, pad) choice can come up one short for
    # some (n, up, down) (regression: n=137815, up=20, down=17 — and
    # integer upsampling, e.g. up=3/down=1, is short for every n).
    n_eff = (n - 1) * up + 1  # input length after dilation
    pad_r = max(pad, (n_out - 1) * down + len(h) - n_eff - pad)
    y = jax.lax.conv_general_dilated(
        xb,
        h.reshape(1, 1, -1),
        window_strides=(down,),
        padding=[(pad, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[:, 0, :n_out].reshape(lead + (n_out,))

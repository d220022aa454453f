"""STFT parameter validation and selection.

Rebuild of the notebook's ``stft_reconstruct_mse`` / ``choose_best_stft_params``
grid search (beam-forming.ipynb cell 5, SURVEY.md §4 item 5): measure the
STFT->iSTFT round-trip error for candidate (n_fft, hop) pairs and pick the
best under a latency constraint. Useful when retuning the pipeline for a
different sample rate or latency budget.
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.dsp.stft import istft, stft
from azoom.dsp.windows import check_nola, hann_np

__all__ = ["stft_reconstruct_mse", "choose_best_stft_params"]


def stft_reconstruct_mse(x: jnp.ndarray, n_fft: int, hop: int) -> float:
    """Round-trip MSE of STFT->iSTFT at the given parameters."""
    Z = stft(x, n_fft, hop)
    y = istft(Z, n_fft, hop, length=x.shape[-1])
    return float(jnp.mean((x - y) ** 2))


def choose_best_stft_params(
    x: jnp.ndarray,
    candidates: tuple[tuple[int, int], ...] = (
        (256, 128), (512, 128), (512, 256), (1024, 256), (1024, 512), (2048, 512),
    ),
    max_latency_samples: int | None = None,
) -> dict:
    """Grid-search candidate (n_fft, hop) pairs.

    Returns {'best': (n_fft, hop), 'results': {(n_fft, hop): mse, ...}}.
    Pairs violating NOLA (non-invertible) or the latency bound are skipped.
    """
    results: dict = {}
    for n_fft, hop in candidates:
        if max_latency_samples is not None and n_fft > max_latency_samples:
            continue
        if not check_nola(hann_np(n_fft), hop):
            continue
        results[(n_fft, hop)] = stft_reconstruct_mse(x, n_fft, hop)
    if not results:
        raise ValueError("no valid (n_fft, hop) candidates")
    best = min(results, key=results.get)
    return {"best": best, "results": results}

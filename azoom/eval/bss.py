"""BSS-eval SDR / SIR / SAR with allowed distortion filters.

The reference's gen-2 pipeline scores with ``mir_eval.bss_eval_sources``
(full_audio_generating_pipeline/inference.py imports mir_eval; notebook
cells 14/16) in addition to its simpler projection metrics. BSS-eval
differs from plain projection by permitting a short (``filter_len``-tap)
distortion filter on each reference before projecting — so an estimate
that is merely a *filtered/delayed* copy of the target still scores high
SDR, which matters for beamformed outputs whose effective channel is not
identity.

Math (Vincent et al. 2006): with references s_j and estimate e,
  s_target = P_{target taps}(e)          (projection onto L delayed copies
                                          of the target)
  P_all    = P_{all sources taps}(e)
  e_interf = P_all - s_target
  e_artif  = e - P_all
  SDR = 10log10 |s_target|^2 / |e_interf + e_artif|^2
  SIR = 10log10 |s_target|^2 / |e_interf|^2
  SAR = 10log10 |s_target + e_interf|^2 / |e_artif|^2

Projections solve the Toeplitz-block Gram system G c = d built from
cross-correlations; correlations come from one batched FFT pass and the
solve is a single (nsrc*L)^2 linear system on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bss_eval_sources"]


def _correlations(sources: jnp.ndarray, estimate: jnp.ndarray, L: int):
    """Cross/auto-correlations via FFT.

    Returns:
      G: (S, L, S, L) with G[j,l,k,m] = sum_t s_j(t-l) s_k(t-m)
      d: (S, L) with d[j,l] = sum_t s_j(t-l) e(t)
    """
    S, n = sources.shape
    nfft = 1 << (2 * n - 1).bit_length()
    SF = jnp.fft.rfft(sources, n=nfft, axis=-1)  # (S, F)
    EF = jnp.fft.rfft(estimate, n=nfft)

    # r_{jk}(tau) = sum_t s_j(t) s_k(t+tau) for tau in [-(L-1), L-1].
    cross = jnp.fft.irfft(jnp.conj(SF[:, None]) * SF[None, :], n=nfft)  # (S,S,nfft)
    # G[j,l,k,m] = r_{jk}(l - m); gather lags l-m in [-(L-1), L-1].
    lags = jnp.arange(L)[:, None] - jnp.arange(L)[None, :]  # (L, L)
    G = cross[:, :, lags % nfft]  # (S, S, L, L)
    G = jnp.transpose(G, (0, 2, 1, 3))  # (S, L, S, L)

    de = jnp.fft.irfft(jnp.conj(SF) * EF[None, :], n=nfft)  # (S, nfft)
    d = de[:, jnp.arange(L) % nfft]  # d[j, l] = sum_t s_j(t) e(t+l)?  see note
    # We need sum_t s_j(t-l) e(t) = sum_t s_j(t) e(t+l) = de[j, l]. OK.
    return G, d


def _project(sources: jnp.ndarray, estimate: jnp.ndarray, L: int, eps: float):
    """Least-squares projection of estimate onto the span of L delayed
    copies of each source; returns the projected signal (same length)."""
    S, n = sources.shape
    G, d = _correlations(sources, estimate, L)
    G2 = G.reshape(S * L, S * L)
    G2 = G2 + eps * jnp.trace(G2) / (S * L) * jnp.eye(S * L)
    c = jnp.linalg.solve(G2, d.reshape(S * L)).reshape(S, L)
    # Reconstruct sum_j (c_j * s_j) with c_j as an L-tap filter.
    nfft = 1 << (n + L - 1).bit_length()
    SF = jnp.fft.rfft(sources, n=nfft, axis=-1)
    CF = jnp.fft.rfft(c, n=nfft, axis=-1)
    y = jnp.fft.irfft(jnp.sum(SF * CF, axis=0), n=nfft)
    return y[:n]


@functools.partial(jax.jit, static_argnames=("target_index", "filter_len"))
def bss_eval_sources(
    reference_sources: jnp.ndarray,
    estimated_source: jnp.ndarray,
    target_index: int = 0,
    filter_len: int = 512,
    eps: float = 1e-10,
) -> dict:
    """BSS-eval of one estimate against nsrc references.

    Args:
      reference_sources: (nsrc, n) true source signals (target first by
        default).
      estimated_source: (n,) enhanced signal.
      filter_len: allowed distortion filter length (mir_eval default 512).

    Returns dict with scalar 'sdr', 'sir', 'sar' (dB).
    """
    refs = reference_sources.astype(jnp.float32)
    e = estimated_source.astype(jnp.float32)
    L = filter_len

    s_target = _project(refs[target_index : target_index + 1], e, L, eps)
    p_all = _project(refs, e, L, eps)
    e_interf = p_all - s_target
    e_artif = e - p_all

    P_t = jnp.sum(s_target**2)
    P_i = jnp.sum(e_interf**2)
    P_a = jnp.sum(e_artif**2)

    return {
        "sdr": 10.0 * jnp.log10(P_t / (P_i + P_a + eps) + eps),
        "sir": 10.0 * jnp.log10(P_t / (P_i + eps) + eps),
        "sar": 10.0 * jnp.log10((P_t + P_i) / (P_a + eps) + eps),
    }

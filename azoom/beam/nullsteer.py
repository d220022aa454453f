"""Hybrid hard-null beamformer — the Final-generation spatial filter.

TPU-native rebuild of ``hybrid_hard_null_bf``
(Final_pipeline/src/inference.py:28-98). Instead of a Python loop over 513
frequency bins with per-bin numpy EVD / cond / solve and try/except, the
whole thing is one batched XLA program over (..., F):

  1. interference covariance from the (1 - target) mask,
  2. principal interference eigenvector via the closed-form 2x2 Hermitian
     EVD (azoom.beam.linalg2x2),
  3. constraint matrix C = [v_tgt, v_int], solve C^H w = [1, 0] by
     Cramer's rule,
  4. data-dependent *selects* replace control flow: cond(C) > 10 ->
     delay-and-sum fallback; f < 200 Hz -> reference-mic bypass
     (inference.py:49-53, 80-92).
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.covariance import masked_covariance
from azoom.beam.linalg2x2 import cond_2x2, eigh_2x2_hermitian, solve_2x2_general
from azoom.beam.linalgmm import eigh_hermitian_small, solve_hermitian_small

__all__ = ["hard_null_weights", "hybrid_hard_null_beamform"]

# M > 2 norm-constrained-LCMV knobs: the smallest achieved target gain
# before the delay-and-sum fallback engages, the eigenvalue dominance a
# direction needs before it earns a null (10x the noise-floor
# eigenvalue — nulling directions without interference evidence points
# the nulls at numerical noise and was measured to AMPLIFY real
# interferers by up to +17 dB per bin), and the fixed-iteration count of
# the per-bin loading bisection.
_GAIN_FLOOR = 0.2
_NULL_SIG = 10.0
_WNG_BISECT_ITERS = 20


def hard_null_weights(
    R_int: jnp.ndarray,
    d_tgt: jnp.ndarray,
    cond_threshold: float = 10.0,
    eps: float = 1e-10,
    n_nulls: int = 1,
    wng_limit: float = 10.0,
) -> jnp.ndarray:
    """Null-steering weights with conditioning fallback.

    Args:
      R_int: (..., F, M, M) interference covariance.
      d_tgt: (..., F, M) phase-normalized target steering vectors.
      n_nulls: how many principal interference eigenvectors to null
        (clamped to M - 1 spatial degrees of freedom). 1 matches the
        reference's single-null behavior; an M-mic array pointed at K
        interferers wants ``n_nulls=K``. Only the directions you null are
        protected — trailing eigenvectors of a K-source scene are noise
        directions, so over-nulling wastes white-noise gain (which is why
        the default stays 1 rather than M - 1).
      wng_limit: M > 2 only — white-noise-gain budget relative to
        delay-and-sum (10 = weights may spend at most 10 dB of noise
        amplification buying null depth; the per-bin loading bisection
        below enforces it).

    Returns:
      (..., F, M) weights: unit target gain with hard nulls where
      well-conditioned, else delay-and-sum toward the target.

    M = 2 keeps the original closed-form construction (2x2 EVD + Cramer
    solve of the square constraint system — bit-stable hot path). M > 2 is
    the LCMV generalization: C = [d_tgt, v_1..v_J] with v_j the top-J
    eigenvectors of R_int (unrolled Jacobi EVD), and the minimum-norm
    solution of C^H w = e_0, i.e. w = C (C^H C)^{-1} e_0 through the
    unrolled (J+1)x(J+1) Hermitian solve — at M = 2, J = 1 the constraint
    system is square, so this coincides with the Cramer path exactly.
    """
    M = d_tgt.shape[-1]
    if M == 2:
        # Principal interference eigenvector, phase-rotated so component 0
        # is real-positive (inference.py:66-69 divides by v[0]/|v[0]|).
        _, eigvecs = eigh_2x2_hermitian(R_int)
        v_int = eigvecs[..., :, -1]  # (..., F, 2)
        phase = v_int[..., :1] / (jnp.abs(v_int[..., :1]) + eps)
        v_int = v_int * jnp.conj(phase)

        # Constraint matrix columns [v_tgt, v_int] -> (..., F, 2, 2); d_tgt
        # may be unbatched (F, 2) while v_int carries batch dims.
        d_tgt = jnp.broadcast_to(d_tgt, v_int.shape)
        C = jnp.stack([d_tgt, v_int], axis=-1)

        # Hard-null solve: C^H w = [1, 0].
        Ch = jnp.swapaxes(jnp.conj(C), -1, -2)
        rhs = jnp.broadcast_to(
            jnp.asarray([1.0 + 0j, 0.0 + 0j], dtype=C.dtype), d_tgt.shape
        )
        w_null = solve_2x2_general(Ch, rhs, eps=eps)

        # Conditioning gate (inference.py:80-85): ill-conditioned (sources
        # too close) -> delay-and-sum fallback.
        cond = cond_2x2(C)
        w_das = d_tgt / M
        bad = ~jnp.isfinite(cond) | (cond > cond_threshold)
        w = jnp.where(bad[..., None], w_das, w_null)
        return jnp.where(jnp.isfinite(w), w, w_das)

    J = max(1, min(n_nulls, M - 1))
    eigvals, eigvecs = eigh_hermitian_small(R_int)
    # Null-significance gate: direction j earns its hard null only where
    # its eigenvalue clearly dominates the noise-floor (smallest)
    # eigenvalue — a near-isotropic R_int (quiet bin, no interference
    # evidence) has ARBITRARY eigenvectors, and constraining them is
    # worse than useless. A zeroed column drops out of the loaded Gram
    # solve entirely, so a bin with no significant directions degrades
    # exactly to w = d/M (delay-and-sum).
    ev_floor = eigvals[..., 0] + 1e-3 * jnp.sum(eigvals, axis=-1) / M
    d_b = jnp.broadcast_to(d_tgt, eigvecs[..., :, 0].shape)
    cols = [d_b]
    for j in range(J):
        v = eigvecs[..., :, -(j + 1)]
        phase = v[..., :1] / (jnp.abs(v[..., :1]) + eps)
        sig = (eigvals[..., -(j + 1)] > _NULL_SIG * ev_floor)[..., None]
        cols.append(jnp.where(sig, v * jnp.conj(phase), 0.0))
    C = jnp.stack(cols, axis=-1)  # (..., F, M, J+1)

    # Norm-constrained minimum-norm LCMV through the Gram system:
    #   w(delta) = C (C^H C + delta tr I)^{-1} e_0, renormalized to exact
    #   unit target gain, with delta bisected PER BIN to the smallest
    #   loading whose weights meet the white-noise-gain budget
    #   ||w||^2 <= wng_limit / M. Rationale: a hard cond gate (the 2-mic
    #   construction above) is the wrong generalization — with J nulls
    #   the target direction is *usually* near the interference span at
    #   low frequencies (every steering vector -> the ones vector as
    #   f -> 0), so an all-or-nothing fallback throws away every
    #   constraint in ~3/4 of the speech band, while an unconstrained
    #   solve goes superdirective (measured +22..+29 dB WNG — unusable on
    #   a real array's sensor noise). The WNG-bisected loading keeps deep
    #   nulls exactly where the array can afford them and softens them
    #   continuously where it can't; as delta -> inf the solution IS
    #   delay-and-sum (the minimum-norm distortionless beamformer), so
    #   congested bins land on the same fallback the cond gate chose,
    #   without a cliff. ||w(delta)|| is monotone decreasing, so 20
    #   bisection steps pin delta to ~1e-2 relative. All fixed-iteration
    #   elementwise ops over the (..., F) batch — jit/vmap/shard-safe.
    G = jnp.einsum("...ij,...ik->...jk", jnp.conj(C), C)
    tr_g = jnp.trace(G.real, axis1=-2, axis2=-1) / (J + 1) + 1e-30
    eye = jnp.eye(J + 1, dtype=G.dtype)
    rhs = jnp.zeros(C.shape[:-2] + (J + 1,), dtype=C.dtype)
    rhs = rhs.at[..., 0].set(1.0)

    def w_unit_of(log_delta):
        delta = jnp.exp(log_delta)
        y = solve_hermitian_small(
            G + (delta * tr_g)[..., None, None] * eye, rhs
        )
        w_raw = jnp.einsum("...ij,...j->...i", C, y)
        g = jnp.einsum("...i,...i->...", jnp.conj(w_raw), d_b)
        w_unit = w_raw / jnp.conj(
            g[..., None] + (jnp.abs(g) < 1e-30)[..., None]
        )
        return w_unit, jnp.abs(g)

    wng_cap = wng_limit / M
    lo = jnp.full(tr_g.shape, jnp.log(1e-7))
    hi = jnp.full(tr_g.shape, jnp.log(1e4))
    for _ in range(_WNG_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        w_mid, _ = w_unit_of(mid)
        over = jnp.sum(jnp.abs(w_mid) ** 2, axis=-1) > wng_cap
        lo = jnp.where(over, mid, lo)
        hi = jnp.where(over, hi, mid)
    w, g_abs = w_unit_of(hi)
    w_das = jnp.broadcast_to(d_b / M, w.shape)
    bad = (
        ~jnp.isfinite(g_abs)
        | (g_abs < _GAIN_FLOOR)
        | (jnp.sum(jnp.abs(w) ** 2, axis=-1) > 2.0 * wng_cap)
    )
    w = jnp.where(bad[..., None], w_das, w)
    return jnp.where(jnp.isfinite(w), w, w_das)


def hybrid_hard_null_beamform(
    Y: jnp.ndarray,
    target_mask: jnp.ndarray,
    d_tgt: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    lowfreq_bypass_hz: float = 200.0,
    cond_threshold: float = 10.0,
    n_nulls: int = 1,
    wng_limit: float = 10.0,
) -> jnp.ndarray:
    """Full hybrid pass on an STFT block.

    Args:
      Y: complex STFT (..., M, F, T).
      target_mask: (..., F, T) target probabilities in [0, 1].
      d_tgt: (F, M) or broadcastable (..., F, M) *phase-normalized* steering.
      freqs_hz: (F,).
      n_nulls: hard nulls to place at M > 2 (see hard_null_weights).

    Returns:
      (..., F, T) beamformed STFT. Below ``lowfreq_bypass_hz`` the raw
      reference mic passes through (inference.py:49-53); the caller applies
      any spectral post-filter.
    """
    R_int = masked_covariance(Y, 1.0 - target_mask)
    w = hard_null_weights(R_int, d_tgt, cond_threshold, n_nulls=n_nulls,
                          wng_limit=wng_limit)
    S = jnp.einsum("...fm,...mft->...ft", jnp.conj(w), Y)
    bypass = (freqs_hz < lowfreq_bypass_hz)[:, None]
    return jnp.where(bypass, Y[..., 0, :, :], S)

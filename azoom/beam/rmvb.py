"""RMVB — Robust Capon / robust MVDR beamformer.

The reference roadmap names this explicitly ("Change the switchmode
beamformer to RMVB ... determined source separation", TODO:9). Standard
MVDR assumes the steering vector is exact; in the audio-zoom product it is
derived from a camera direction that is only approximately right, and the
mismatch causes target self-cancellation (the same failure mode the FOV
protection cone in azoom.masks.geometric addresses on the covariance
side). RMVB (Li, Stoica & Wang 2003) fixes it on the steering side:
maximize output power over all steering vectors inside an uncertainty
sphere ||a - a_bar||^2 <= eps, which reduces to

    a_hat = a_bar - (I + lambda R)^{-1} a_bar,
    g(lambda) = ||(I + lambda R)^{-1} a_bar||^2 = eps,

followed by the ordinary MVDR solve with a_hat. g is monotone decreasing
in lambda, so the 1-D root-find is a fixed-iteration bisection — fully
jittable, batched over every frequency bin at once via the closed-form
2x2 eigendecomposition at M = 2 and the unrolled cyclic-Jacobi EVD
(azoom.beam.linalgmm.eigh_hermitian_small) for larger arrays (no per-bin
loops, no LAPACK) — every step after the EVD is dimension-agnostic, so
the same bisection serves any mic count.
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.covariance import masked_covariance
from azoom.beam.linalgmm import eigh_hermitian_small
from azoom.beam.mvdr import apply_weights, mvdr_weights

__all__ = ["rmvb_weights", "rmvb_beamform"]

_BISECT_ITERS = 30


def rmvb_weights(
    R: jnp.ndarray,
    d: jnp.ndarray,
    eps_uncertainty: float = 0.5,
    sigma: float = 1e-7,
    R_solve: jnp.ndarray | None = None,
    correction_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Robust Capon weights for M-element arrays.

    Args:
      R: (..., F, M, M) Hermitian covariance used for the steering
        correction — it must CONTAIN the signal of interest (the classic
        RCB setting uses the sample/mixture covariance; the masked variant
        below uses the target-weighted covariance). M = 2 runs the
        closed-form EVD, M > 2 the unrolled Jacobi (linalgmm).
      d: (..., F, M) nominal steering vectors (||d||^2 = M).
      eps_uncertainty: radius^2 of the steering uncertainty sphere; must be
        < ||d||^2 = M. Larger = more robust to pointing error, wider beam
        (eps -> 0 recovers plain MVDR). 0.5 tolerates ~10-15 deg of
        look-direction error at 4 cm spacing.
      sigma: diagonal loading for the final solve.
      R_solve: covariance for the final MVDR solve; defaults to ``R``. The
        masked-beamforming hybrid passes the noise-only covariance here
        (correct the steering with target evidence, null with noise
        evidence).
      correction_weight: optional (..., 1) per-bin blend in [0, 1] between
        the nominal steering (0) and the corrected one (1); used to
        disable the correction where R carries no target evidence.

    Returns: (..., F, M) complex weights, distortionless toward the
    *corrected* steering vector.
    """
    # Eigenbasis of R: R = U diag(g) U^H, g ascending, columns unit.
    gam, U = eigh_hermitian_small(R)
    gam = jnp.maximum(gam, 0.0)
    b = jnp.einsum("...ij,...i->...j", jnp.conj(U), d)  # U^H d, (..., 2)
    b2 = (b * jnp.conj(b)).real

    # g(lam) = sum_i b2_i / (1 + lam*gam_i)^2, solve g(lam) = eps.
    def g(lam):
        return jnp.sum(b2 / (1.0 + lam[..., None] * gam) ** 2, axis=-1)

    norm2 = jnp.sum(b2, axis=-1)  # = ||d||^2
    eps = jnp.minimum(eps_uncertainty, 0.9 * norm2)
    # Upper bisection bound: g(lam) >= norm2/(1+lam*gmax)^2 -> lam_hi.
    gmax = jnp.maximum(gam[..., -1], 1e-30)
    gmin_pos = jnp.maximum(gam[..., 0], 1e-6 * gmax)
    lam_hi = (jnp.sqrt(norm2 / eps) - 1.0) / gmin_pos
    lam_hi = jnp.maximum(lam_hi, 0.0)
    # No-root guard: for near-rank-1 R (gam_min ~ 0 — e.g. one coherent
    # source on 2 mics) g(lam) -> b2 along the small eigenvector as
    # lam -> inf, so g(lam) = eps may have no solution and the bisection
    # would saturate at a bound set by the gmin clamp rather than by the
    # uncertainty constraint. Detect it by checking the bracket actually
    # brackets (g(lam_hi) <= eps) and fall back to the nominal steering
    # at those bins.
    has_root = g(lam_hi) <= eps
    lo = jnp.zeros_like(lam_hi)
    hi = lam_hi
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        too_big = g(mid) > eps  # g decreasing: need larger lam
        lo = jnp.where(too_big, mid, lo)
        hi = jnp.where(too_big, hi, mid)
    lam = 0.5 * (lo + hi)

    # a_hat = d - (I + lam R)^{-1} d  (in the eigenbasis: elementwise).
    b_corr = b * (1.0 - 1.0 / (1.0 + lam[..., None] * gam)).astype(b.dtype)
    a_hat = jnp.einsum("...ij,...j->...i", U, b_corr)
    a_hat = jnp.where(has_root[..., None], a_hat, d)
    # Degenerate guard: if the correction collapsed (eps ~ ||d||^2 or
    # R ~ 0), fall back to the nominal steering.
    a_norm2 = jnp.sum(jnp.abs(a_hat) ** 2, axis=-1, keepdims=True)
    use_nominal = a_norm2 < 1e-8 * jnp.sum(jnp.abs(d) ** 2, axis=-1, keepdims=True)
    a_hat = jnp.where(use_nominal, d, a_hat)
    if correction_weight is not None:
        # Blend toward the nominal steering where the correction is not
        # trustworthy (no target evidence in R at that bin).
        a_hat = correction_weight * a_hat + (1.0 - correction_weight) * d
    # Rescale to the nominal norm so the distortionless constraint keeps
    # the usual gain calibration.
    a_hat = a_hat * jnp.sqrt(
        jnp.sum(jnp.abs(d) ** 2, axis=-1, keepdims=True)
        / jnp.maximum(jnp.sum(jnp.abs(a_hat) ** 2, axis=-1, keepdims=True), 1e-30)
    )
    return mvdr_weights(R if R_solve is None else R_solve, a_hat, sigma=sigma)


def rmvb_beamform(
    Y: jnp.ndarray,
    noise_mask: jnp.ndarray,
    d: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    eps_uncertainty: float = 0.5,
    sigma: float = 1e-7,
    hp_cutoff_hz: float = 100.0,
) -> jnp.ndarray:
    """Full masked-RMVB pass on an STFT block (mvdr_beamform's robust
    twin; same contract).

    Hybrid masked formulation: the steering correction sees the
    target-weighted covariance (1 - noise_mask — it must contain the
    signal of interest for the power-maximization rationale to point the
    right way), the final distortionless solve sees the noise-weighted
    covariance. RCB's SOI-dominance assumption fails at bins where the
    target-weighted covariance carries little target energy (speech is
    sparse), so the correction is blended per frequency by the target
    dominance q = tr(R_sig) / (tr(R_sig) + tr(R_noise)) — bins without
    target evidence keep the nominal steering instead of tilting toward
    whatever leaked into R_sig.
    """
    R_noise = masked_covariance(Y, noise_mask)
    R_sig = masked_covariance(Y, 1.0 - noise_mask)
    tr = lambda R: jnp.trace(R, axis1=-2, axis2=-1).real
    q = tr(R_sig) / (tr(R_sig) + tr(R_noise) + 1e-30)  # (..., F)
    w = rmvb_weights(
        R_sig, d, eps_uncertainty, sigma, R_solve=R_noise,
        correction_weight=q[..., None],
    )
    S = apply_weights(w, Y)
    keep = (freqs_hz >= hp_cutoff_hz)[:, None]
    return jnp.where(keep, S, 0.0)

"""GEV / max-SNR beamformers, with field-of-view constrained variants.

The reference repo shipped *outputs* of these beamformers
(data/outputs/output_oracle_gev.wav, output_maxsnr_fov_{3.0,20.0}deg.wav)
but the generating code lived in the gitignored experiments/ dir
(SURVEY.md §1 cross-layer artifacts). This module restores the capability
as first-class TPU-native code.

The max-SNR (= GEV) beamformer maximizes

    SNR(w) = (w^H R_tgt w) / (w^H R_noise w)

whose optimum is the principal generalized eigenvector of (R_tgt, R_noise).
For M = 2 this reduces to the principal eigenvector of A = R_noise^-1 R_tgt,
a general (non-Hermitian) 2x2 matrix with a closed-form eigendecomposition —
pure VPU arithmetic over all (..., F) bins at once. For M > 2 (the round-3
M-mic generalization, azoom.beam.linalgmm) the principal generalized
eigenvector comes from a trace-time-unrolled power iteration on
Rn^-1 R_tgt: the pair is Hermitian PSD, so eigenvalues are real
non-negative and the iteration converges geometrically in the eigengap;
every step is one matvec + one unrolled-Cholesky solve over the (..., F)
batch — still no LAPACK-style decomposition anywhere.

GEV weights carry an arbitrary per-bin complex scale; we fix it with Blind
Analytic Normalization (BAN, Warsitz & Haeb-Umbach 2007) or a
distortionless projection onto the target steering vector.

The FOV-constrained variant replaces the point steering covariance with an
average over a window of azimuths around the target — the "visual zoom"
field of view: a 3 deg FOV yields a much narrower acceptance beam than
20 deg, reproducing the maxsnr_fov_{3,20}deg artifacts.
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.linalg2x2 import solve_2x2_hermitian
from azoom.beam.linalgmm import solve_hermitian_small
from azoom.dsp.delays import steering_vector

__all__ = [
    "eig_principal_2x2",
    "gev_principal_power",
    "gev_weights",
    "fov_target_covariance",
    "max_snr_fov_beamform",
    "gev_beamform",
]


def eig_principal_2x2(
    A: jnp.ndarray, eps: float = 1e-12, rel_tol: float = 1e-6
) -> jnp.ndarray:
    """Principal (largest-|lambda|) eigenvector of a general complex 2x2
    matrix (..., 2, 2), closed form, unit norm.

    Degeneracy (A ~ isotropic, eigenbasis arbitrary — e.g. R_tgt
    proportional to R_noise in the GEV solve) is detected RELATIVE to the
    matrix scale, same rationale as eigh_2x2_hermitian: an absolute
    threshold either never fires (post-clamp norms) or silently snaps
    small-but-anisotropic matrices to e0.
    """
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    tr = a + d
    det = a * d - b * c
    disc = jnp.sqrt(tr * tr - 4.0 * det + 0j)
    lam1 = 0.5 * (tr + disc)
    lam2 = 0.5 * (tr - disc)
    lam = jnp.where(jnp.abs(lam1) >= jnp.abs(lam2), lam1, lam2)
    # (A - lam I) v = 0 -> rows give two candidate constructions, whose
    # norms are ~ |A| x O(1) whenever the eigenvector is well defined.
    v1 = jnp.stack([b, lam - a], axis=-1)
    v2 = jnp.stack([lam - d, c], axis=-1)
    n1 = jnp.sum(jnp.abs(v1) ** 2, axis=-1, keepdims=True)
    n2 = jnp.sum(jnp.abs(v2) ** 2, axis=-1, keepdims=True)
    v = jnp.where(n1 >= n2, v1, v2)
    nsq = jnp.sum(jnp.abs(v) ** 2, axis=-1, keepdims=True)
    scale = jnp.abs(a) + jnp.abs(b) + jnp.abs(c) + jnp.abs(d)
    degenerate = nsq <= (rel_tol * scale[..., None]) ** 2 + eps * eps
    nv = jnp.sqrt(jnp.where(degenerate, 1.0, nsq))
    e0 = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(degenerate, e0, v / nv)


def gev_principal_power(
    R_tgt: jnp.ndarray,
    Rn: jnp.ndarray,
    iters: int = 12,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Principal generalized eigenvector of the Hermitian PSD pencil
    (R_tgt, Rn) for any (static) M, by power iteration on A = Rn^-1 R_tgt.

    Inputs are assumed trace-normalized O(1) (the caller does this — same
    rationale as the 2x2 path). The pencil's eigenvalues are real and
    non-negative, so plain power iteration converges geometrically in the
    eigengap; ``iters`` is static and unrolled — each step is one matvec
    plus one unrolled-Cholesky solve (azoom.beam.linalgmm), all
    elementwise over the (..., F) batch. Init is the all-ones vector: its
    component along the principal eigenvector is nonzero for any
    beamforming covariance that is not exactly orthogonal to it (and a
    degenerate pencil — R_tgt proportional to Rn — returns a harmless
    arbitrary direction, matching the 2x2 path's degeneracy behavior).
    Returns unit-norm (..., M).
    """
    M = Rn.shape[-1]
    v = jnp.ones(Rn.shape[:-1], Rn.dtype) / jnp.sqrt(
        jnp.asarray(M, Rn.real.dtype)
    )
    for _ in range(iters):
        u = jnp.einsum("...ij,...j->...i", R_tgt, v)
        w = solve_hermitian_small(Rn, u)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2, axis=-1, keepdims=True))
        # Collapse guard: an (all-but-)zero R_tgt maps v to ~0 — keep the
        # previous (unit-norm) direction instead of normalizing a zero
        # vector, so the degenerate case returns the harmless init
        # direction rather than the zero vector (whose downstream
        # reference-normalization would be 0/0).
        v = jnp.where(nrm > eps, w / jnp.maximum(nrm, eps), v)
    return v


def gev_weights(
    R_tgt: jnp.ndarray,
    R_noise: jnp.ndarray,
    d_tgt: jnp.ndarray | None = None,
    sigma: float = 1e-7,
    normalization: str = "ban",
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Max-SNR weights: principal generalized eigvec of (R_tgt, R_noise).

    Args:
      R_tgt / R_noise: (..., F, M, M) Hermitian covariances (M = 2 runs
        the closed-form eig; M > 2 the whitened power iteration).
      d_tgt: (..., F, M) steering vectors, required for
        ``normalization='distortionless'``.
      normalization: 'ban' (blind analytic normalization), 'distortionless'
        (scale so w^H d = 1), or 'none'.

    Returns: (..., F, M) complex weights.
    """
    M = R_noise.shape[-1]
    eye = jnp.eye(M, dtype=R_noise.dtype)
    Rn = R_noise + sigma * eye
    # A = Rn^-1 R_tgt, column by column via the Hermitian 2x2 solve.
    # Both matrices are trace-normalized first: the principal eigenvector
    # of A is invariant to per-bin rescaling of either factor, and O(1)
    # entries keep the det and divisions inside f32 range (quiet bins
    # carry covariances ~1e-7 whose raw det overflows A to inf on TPU,
    # turning the eig into NaN). The det floor guards exactly-rank-1
    # noise fields; it is meaningful because post-normalization det is
    # dimensionless in [0, 1].
    t_n = jnp.trace(Rn.real, axis1=-2, axis2=-1) / M
    t_t = jnp.trace(R_tgt.real, axis1=-2, axis2=-1) / M
    Rn_h = Rn / jnp.maximum(t_n, 1e-30)[..., None, None]
    Rt_h = (R_tgt / jnp.maximum(t_t, 1e-30)[..., None, None]).astype(Rn.dtype)
    if M == 2:
        col0 = solve_2x2_hermitian(Rn_h, Rt_h[..., :, 0], eps=1e-10)
        col1 = solve_2x2_hermitian(Rn_h, Rt_h[..., :, 1], eps=1e-10)
        A = jnp.stack([col0, col1], axis=-1)
        w = eig_principal_2x2(A)
    else:
        # M-mic generalization: unrolled power iteration on the whitened
        # pencil (azoom.beam.linalgmm) — no reference counterpart (the
        # reference is hard-wired to 2 mics).
        w = gev_principal_power(Rt_h, Rn_h)

    if normalization == "ban":
        # gain = sqrt(w^H Rn Rn w / M) / (w^H Rn w)  (Warsitz 2007, eq. 27)
        Rn_w = jnp.einsum("...fij,...fj->...fi", Rn, w)
        num = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.abs(Rn_w) ** 2, axis=-1) / M, 0.0)
        )
        den = jnp.einsum("...fi,...fi->...f", jnp.conj(w), Rn_w).real
        w = w * (num / (den + eps))[..., None]
    elif normalization == "distortionless":
        if d_tgt is None:
            raise ValueError("distortionless normalization needs d_tgt")
        g = jnp.sum(jnp.conj(w) * d_tgt, axis=-1, keepdims=True)
        w = w * jnp.conj(g) / (jnp.abs(g) ** 2 + eps)
    elif normalization != "none":
        raise ValueError(f"unknown normalization {normalization!r}")
    return w


def fov_target_covariance(
    freqs_hz: jnp.ndarray,
    center_deg: float,
    fov_deg: float,
    mic_dist: float,
    c: float = 343.0,
    n_mics: int = 2,
    n_points: int = 9,
) -> jnp.ndarray:
    """Steering covariance averaged over a field of view:
    R_fov[f] = mean_theta d(f,theta) d(f,theta)^H for theta in
    [center - fov/2, center + fov/2]. The acceptance-region model for the
    'zoom window' — small fov = tight zoom."""
    angles = center_deg + jnp.linspace(-fov_deg / 2.0, fov_deg / 2.0, n_points)
    D = steering_vector(freqs_hz, angles, mic_dist, c, n_mics)  # (A, F, M)
    return jnp.einsum("afm,afn->fmn", D, jnp.conj(D)) / n_points


def gev_beamform(
    Y: jnp.ndarray,
    target_mask: jnp.ndarray,
    sigma: float = 1e-7,
    normalization: str = "ban",
    d_tgt: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mask-driven GEV: estimate R_tgt from the target mask and R_noise from
    its complement, then apply max-SNR weights. Y (..., M, F, T) -> (..., F, T)."""
    from azoom.beam.covariance import masked_covariance

    R_tgt = masked_covariance(Y, target_mask)
    R_noise = masked_covariance(Y, 1.0 - target_mask)
    w = gev_weights(R_tgt, R_noise, d_tgt, sigma, normalization)
    return jnp.einsum("...fm,...mft->...ft", jnp.conj(w), Y)


def max_snr_fov_beamform(
    Y: jnp.ndarray,
    noise_mask: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    center_deg: float,
    fov_deg: float,
    mic_dist: float,
    c: float = 343.0,
    sigma: float = 1e-7,
) -> jnp.ndarray:
    """FOV-constrained max-SNR: the target covariance is the geometric
    steering average over the zoom window instead of a mask estimate —
    restores the output_maxsnr_fov_{3.0,20.0}deg.wav capability."""
    from azoom.beam.covariance import masked_covariance

    R_fov = fov_target_covariance(freqs_hz, center_deg, fov_deg, mic_dist, c,
                                  Y.shape[-3])
    R_noise = masked_covariance(Y, noise_mask)
    d0 = steering_vector(freqs_hz, center_deg, mic_dist, c, Y.shape[-3])
    w = gev_weights(R_fov.astype(Y.dtype), R_noise, d0, sigma, "distortionless")
    return jnp.einsum("...fm,...mft->...ft", jnp.conj(w), Y)

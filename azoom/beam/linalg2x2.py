"""Closed-form 2x2 complex Hermitian linear algebra.

The reference leans on numpy.linalg.solve / eigh / cond per frequency bin
inside Python loops (masked_mvdr.py:117, Final_pipeline/src/inference.py:65,
80). On TPU, generic LAPACK-style decompositions are the wrong tool for 2x2
systems: everything here has a closed form that vectorizes over arbitrary
batch dimensions as pure VPU arithmetic, never hits a host fallback, and
needs no try/except (singularity is handled by diagonal loading + the
adjugate formulation).

All functions accept Hermitian R of shape (..., 2, 2) (a = R[...,0,0] and
c = R[...,1,1] real, b = R[...,0,1] = conj(R[...,1,0])).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["solve_2x2_hermitian", "eigh_2x2_hermitian", "cond_2x2"]


def solve_2x2_hermitian(R: jnp.ndarray, d: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Solve R x = d for Hermitian R (..., 2, 2) and d (..., 2) via adjugate.

        R^-1 = [[c, -b], [-b*, a]] / (a c - |b|^2)
    """
    a = R[..., 0, 0]
    b = R[..., 0, 1]
    c = R[..., 1, 1]
    det = a * c - b * jnp.conj(b)
    det = det + eps
    x0 = (c * d[..., 0] - b * d[..., 1]) / det
    x1 = (a * d[..., 1] - jnp.conj(b) * d[..., 0]) / det
    return jnp.stack([x0, x1], axis=-1)


def solve_2x2_general(A: jnp.ndarray, d: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Solve A x = d for a general complex 2x2 A (..., 2, 2) via Cramer's rule.
    Used by the hard-null beamformer's constraint solve C^H w = [1, 0]
    (Final_pipeline/src/inference.py:95)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, e = A[..., 1, 0], A[..., 1, 1]
    det = a * e - b * c + eps
    x0 = (e * d[..., 0] - b * d[..., 1]) / det
    x1 = (a * d[..., 1] - c * d[..., 0]) / det
    return jnp.stack([x0, x1], axis=-1)


def eigh_2x2_hermitian(R: jnp.ndarray, eps: float = 1e-12, rel_tol: float = 1e-6):
    """Eigen-decomposition of Hermitian R (..., 2, 2), closed form.

    Returns (eigvals, eigvecs) with eigvals (..., 2) ascending (matching
    numpy.linalg.eigh so the principal eigenvector is eigvecs[..., :, -1])
    and eigvecs (..., 2, 2) unit-norm columns.

    Degeneracy (isotropic R, where the eigenbasis is arbitrary) is detected
    RELATIVE to the matrix scale — an absolute threshold silently snaps
    small-magnitude but perfectly anisotropic matrices (e.g. quiet-bin
    covariances ~1e-7) to the e-basis, which mis-steers any beamformer
    built on the result.
    """
    a = R[..., 0, 0].real
    b = R[..., 0, 1]
    c = R[..., 1, 1].real
    half_tr = 0.5 * (a + c)
    half_diff = 0.5 * (a - c)
    radius = jnp.sqrt(half_diff**2 + (b * jnp.conj(b)).real)
    lam_min = half_tr - radius
    lam_max = half_tr + radius
    eigvals = jnp.stack([lam_min, lam_max], axis=-1)

    # Scale of the problem: |R| ~ |half_tr| + radius. The eigenvector
    # candidates below have norm ~ radius x O(1) when non-degenerate.
    scale = jnp.abs(half_tr) + radius + eps

    # Eigenvector for lambda: (R - lam I) v = 0. Two candidate constructions;
    # pick per-element the one with the larger norm for numerical stability
    # (they coincide up to phase when both are nonzero).
    def vec_for(lam):
        v1 = jnp.stack([b, lam - a], axis=-1)           # from row 0
        v2 = jnp.stack([lam - c, jnp.conj(b)], axis=-1)  # from row 1
        n1 = jnp.sum(jnp.abs(v1) ** 2, axis=-1, keepdims=True)
        n2 = jnp.sum(jnp.abs(v2) ** 2, axis=-1, keepdims=True)
        v = jnp.where(n1 >= n2, v1, v2)
        nsq = jnp.sum(jnp.abs(v) ** 2, axis=-1, keepdims=True)
        n = jnp.sqrt(jnp.maximum(nsq, eps * eps))
        # Degenerate relative to scale: fall back to e-basis.
        fallback = jnp.broadcast_to(
            jnp.asarray([1.0 + 0j, 0.0 + 0j], dtype=R.dtype), v.shape
        )
        degenerate = nsq < (rel_tol * scale[..., None]) ** 2
        return jnp.where(degenerate, fallback, v / n)

    v_min = vec_for(lam_min)
    v_max = vec_for(lam_max)
    # If degenerate (isotropic R), make the two vectors orthogonal.
    degenerate = (radius < rel_tol * scale)[..., None]
    e0 = jnp.zeros_like(v_min).at[..., 0].set(1.0)
    e1 = jnp.zeros_like(v_max).at[..., 1].set(1.0)
    v_min = jnp.where(degenerate, e0, v_min)
    v_max = jnp.where(degenerate, e1, v_max)
    eigvecs = jnp.stack([v_min, v_max], axis=-1)  # columns
    return eigvals, eigvecs


def cond_2x2(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """2-norm condition number of a general 2x2 complex matrix (..., 2, 2):
    ratio of singular values, via eigenvalues of A^H A. Replaces
    numpy.linalg.cond in the hard-null safety gate
    (Final_pipeline/src/inference.py:81)."""
    AhA = jnp.einsum("...ij,...ik->...jk", jnp.conj(A), A)
    eigvals, _ = eigh_2x2_hermitian(AhA)
    s_min = jnp.sqrt(jnp.maximum(eigvals[..., 0], 0.0))
    s_max = jnp.sqrt(jnp.maximum(eigvals[..., 1], 0.0))
    return s_max / jnp.maximum(s_min, eps)

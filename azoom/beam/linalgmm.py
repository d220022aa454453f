"""Small-M complex Hermitian linear algebra for M-mic arrays (M > 2).

The reference is a strictly 2-microphone system — its own readme documents
the consequence: "blind MVDR fails vs >= 2 interferers" because an M-mic
MVDR has only M-1 spatial degrees of freedom (readme.md:19,
tf_lite_version/inference.py:147 broadcast-solves exactly 2x2 systems).
azoom keeps the closed-form 2x2 path (azoom.beam.linalg2x2) as the 2-mic
hot path and adds this module so the SAME pipelines run on larger linear
arrays: the covariance / steering / sweep layers are already shaped
(..., F, M, M) for any M; the only missing primitive was the batched
Hermitian solve.

Design: mic counts are static under jit and small (2-8), so the Cholesky
factorization and the triangular solves are UNROLLED over M in Python at
trace time — every emitted op is an elementwise mul/add/sqrt/div over the
(..., F) batch, which XLA fuses into a few VPU passes. No LAPACK-style
dynamic decomposition (TPU-hostile), no per-bin loops, and positive
definiteness is guaranteed by the caller's diagonal loading (the same
sigma knob as the 2x2 path).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "cholesky_small",
    "solve_hermitian_small",
    "solve_hermitian",
    "eigh_hermitian_small",
]


def cholesky_small(R: jnp.ndarray, eps: float = 1e-7) -> list[list[jnp.ndarray]]:
    """Unrolled Cholesky R = L L^H of (..., M, M) Hermitian PSD matrices.

    Returns the lower factor as an M x M list-of-lists of (...,) arrays
    (entries above the diagonal are None) — kept unpacked so the
    substitution steps below never materialize an (..., M, M) array.
    Diagonal pivots are clamped RELATIVE to the matrix scale (``eps`` x
    the largest diagonal entry) so a semidefinite input (a rank-deficient
    covariance — coherent source, silent channel) degrades to a bounded
    minimum-norm-flavored solution instead of overflowing to NaN: an
    absolute clamp would make later substitutions divide by ~sqrt(tiny)
    and cascade to inf in complex64. Same relative-eps convention as
    azoom.beam.linalg2x2.
    """
    M = R.shape[-1]
    diag_max = jnp.real(R[..., 0, 0])
    for j in range(1, M):
        diag_max = jnp.maximum(diag_max, jnp.real(R[..., j, j]))
    floor = eps * diag_max + 1e-30
    L: list[list[jnp.ndarray | None]] = [[None] * M for _ in range(M)]
    for j in range(M):
        s = R[..., j, j]
        for k in range(j):
            s = s - L[j][k] * jnp.conj(L[j][k])
        # Exact arithmetic makes s real-positive; clamp for safety.
        piv = jnp.sqrt(jnp.maximum(jnp.real(s), floor))
        L[j][j] = piv.astype(R.dtype)
        for i in range(j + 1, M):
            t = R[..., i, j]
            for k in range(j):
                t = t - L[i][k] * jnp.conj(L[j][k])
            L[i][j] = t / L[j][j]
    return L


def solve_hermitian_small(
    R: jnp.ndarray, d: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Solve R x = d for Hermitian PSD R (..., M, M), d (..., M), any M.

    Unrolled Cholesky + forward/back substitution; O(M^3) elementwise ops
    over the batch, M static. For M = 2 prefer
    :func:`azoom.beam.linalg2x2.solve_2x2_hermitian` (fewer ops; this
    function agrees with it to float tolerance and with a dense NumPy
    solve — tests/test_mmic.py).
    """
    M = R.shape[-1]
    L = cholesky_small(R, eps)
    # Forward: L y = d.
    y: list[jnp.ndarray] = []
    for i in range(M):
        s = d[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    # Back: L^H x = y  (L^H[i, k] = conj(L[k][i]), k >= i).
    x: list[jnp.ndarray | None] = [None] * M
    for i in reversed(range(M)):
        s = y[i]
        for k in range(i + 1, M):
            s = s - jnp.conj(L[k][i]) * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def solve_hermitian(R: jnp.ndarray, d: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Hermitian solve dispatching on the (static) mic count: the
    closed-form adjugate path for M = 2 (the product hot path), the
    unrolled Cholesky for M > 2. ``eps`` follows the 2x2 convention
    (added to the determinant / relative pivot clamp) — callers
    regularize via diagonal loading, so the default is fine for loaded
    systems."""
    if R.shape[-1] == 2:
        from azoom.beam.linalg2x2 import solve_2x2_hermitian

        return solve_2x2_hermitian(R, d, eps=eps)
    return solve_hermitian_small(R, d, eps=eps if eps > 0.0 else 1e-7)


def eigh_hermitian_small(
    R: jnp.ndarray, sweeps: int = 6
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full eigendecomposition of (..., M, M) Hermitian matrices for small
    static M, by trace-time-unrolled cyclic Jacobi.

    Returns ``(eigvals, eigvecs)`` following numpy.linalg.eigh conventions:
    eigvals (..., M) ascending, eigvecs (..., M, M) unit-norm COLUMNS, so
    the principal eigenvector is ``eigvecs[..., :, -1]`` and
    R = U diag(eigvals) U^H.

    Design (same doctrine as the solves above): M is static and tiny, so
    the pair loop is unrolled in Python at trace time; each rotation is the
    already-validated closed-form 2x2 Hermitian EVD
    (azoom.beam.linalg2x2.eigh_2x2_hermitian) of the (p, q) block, applied
    two-sided to the batched working matrix and accumulated into U — every
    emitted op is an elementwise VPU pass over the (..., F) batch, no
    LAPACK-style dynamic iteration, no per-bin host loops (the reference
    runs numpy.linalg.eigh per frequency bin inside a Python loop,
    Final_pipeline/src/inference.py:65). Cyclic Jacobi converges
    quadratically; ``sweeps=6`` puts the off-diagonal residue below
    float32 noise for M <= 8 (validated against numpy.linalg.eigh in
    tests/test_mmic.py). At M = 2 this returns the closed form directly.
    """
    M = R.shape[-1]
    from azoom.beam.linalg2x2 import eigh_2x2_hermitian

    if M == 2:
        return eigh_2x2_hermitian(R)
    A = R
    eye = jnp.eye(M, dtype=R.dtype)
    U = jnp.broadcast_to(eye, R.shape)
    for _ in range(sweeps):
        for p in range(M - 1):
            for q in range(p + 1, M):
                blk = jnp.stack(
                    [
                        jnp.stack([A[..., p, p], A[..., p, q]], axis=-1),
                        jnp.stack([A[..., q, p], A[..., q, q]], axis=-1),
                    ],
                    axis=-2,
                )
                _, V = eigh_2x2_hermitian(blk)
                v00 = V[..., 0, 0][..., None]
                v10 = V[..., 1, 0][..., None]
                v01 = V[..., 0, 1][..., None]
                v11 = V[..., 1, 1][..., None]
                # A <- G^H A G with G = I except the (p, q) block = V.
                colp = A[..., :, p] * v00 + A[..., :, q] * v10
                colq = A[..., :, p] * v01 + A[..., :, q] * v11
                A = A.at[..., :, p].set(colp).at[..., :, q].set(colq)
                rowp = (
                    jnp.conj(v00) * A[..., p, :] + jnp.conj(v10) * A[..., q, :]
                )
                rowq = (
                    jnp.conj(v01) * A[..., p, :] + jnp.conj(v11) * A[..., q, :]
                )
                A = A.at[..., p, :].set(rowp).at[..., q, :].set(rowq)
                up = U[..., :, p] * v00 + U[..., :, q] * v10
                uq = U[..., :, p] * v01 + U[..., :, q] * v11
                U = U.at[..., :, p].set(up).at[..., :, q].set(uq)
    ev = jnp.real(jnp.diagonal(A, axis1=-2, axis2=-1))
    order = jnp.argsort(ev, axis=-1)
    ev_sorted = jnp.take_along_axis(ev, order, axis=-1)
    U_sorted = jnp.take_along_axis(U, order[..., None, :], axis=-1)
    return ev_sorted, U_sorted

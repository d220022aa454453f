"""RTF-steered MVDR — geometry-free steering measured from the data.

Every beamformer the reference ships steers with the *anechoic plane-wave
model* d(f, theta) = exp(-j 2 pi f tau_m(theta)) (masked_mvdr.py:96-101,
Final_pipeline/src/inference.py:60-66): it needs the mic spacing and a look
angle, and it describes the true acoustic transfer function only in free
field. In a room the target's transfer function includes early reflections;
on a real array the spacing is only nominally known (the reference itself
disagrees with its own hardware about it — masked_mvdr.py:10 D=0.01 vs
world_building.py:13 4 cm). The relative transfer function (RTF) estimator
removes the geometric model entirely: the mask already says which TF bins
are target- vs noise-dominated, so the target's spatial signature can be
*measured* from the masked covariances.

Estimator: **covariance whitening** (Markovich-Golan & Gannot's CW method
from the NN-mask beamforming literature). The principal generalized
eigenvector v of the pencil (R_tgt, R_noise) — closed form via
``eig_principal_2x2(R_noise^-1 R_tgt)``, pure VPU arithmetic over all
(..., F) bins at once — maximizes masked SNR; de-whitening a = R_noise v
recovers the target steering up to scale, and normalizing to reference
mic 0 gives the RTF a(f) = [1, h(f)]. MVDR with the constraint w^H a = 1
then reconstructs the target *as the reference mic heard it* —
reflections, spacing errors and all.

The covariance-SUBTRACTION estimator (principal eigenvector of
R_tgt − R_noise) was implemented and evaluated first: on oracle-masked
reverb scenes it lost 3–6 dB SDR to the geometric steering and produced
non-finite output on one of four scenes (the difference matrix goes
indefinite wherever the mask's noise leak exceeds the noise average).
Whitening matched geometric steering on every scene. Documented negative
result; subtraction is not shipped.

Per-bin confidence (generalized-eigenvalue separation = masked SNR
anisotropy) gates a fallback to the geometric steering wherever the data
does not pin down the RTF — so 'rtf' is never worse-posed than 'mvdr',
just better informed, and with no fallback provided it is a fully
geometry-free beamformer: no mic spacing, no look angle, only the mask.

No reference counterpart exists; cited anchors are the steering-model call
sites this generalizes.
"""

from __future__ import annotations

import jax.numpy as jnp

from azoom.beam.covariance import masked_covariance
from azoom.beam.gev import eig_principal_2x2, gev_principal_power
from azoom.beam.linalg2x2 import solve_2x2_hermitian
from azoom.beam.linalgmm import solve_hermitian_small
from azoom.beam.mvdr import apply_weights, mvdr_weights

__all__ = ["rtf_from_covariances", "rtf_mvdr_beamform"]


def rtf_from_covariances(
    R_tgt: jnp.ndarray,
    R_noise: jnp.ndarray,
    ref_floor: float = 0.1,
    load: float = 1e-6,
    eps: float = 1e-12,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate per-bin RTF steering vectors by covariance whitening.

    Args:
      R_tgt: (..., F, M, M) Hermitian target-masked covariance (M = 2
        runs the closed-form pencil eig; M > 2 the whitened power
        iteration — azoom.beam.gev.gev_principal_power — with the
        confidence from the principal Rayleigh quotient against the mean
        of the remaining generalized spectrum, which coincides with the
        2x2 definition at M = 2).
      R_noise: (..., F, M, M) Hermitian noise-masked covariance. Diagonal
        loading of ``load`` x trace keeps the whitening solve well-posed at
        bins where the noise average is near-singular.
      ref_floor: smallest reference-mic magnitude (relative to the steering
        vector's norm) the normalization will divide by. An RTF is only
        defined up to the target being audible at the reference mic; the
        floor caps |h| at ~1/ref_floor instead of letting a near-null
        explode the distortionless constraint.

    Returns:
      (a, conf): a (..., F, 2) complex RTF with a[..., 0] ~ 1;
      conf (..., F) in [0, 1] — separation of the generalized eigenvalues
      of (R_tgt, R_noise), i.e. how anisotropic the masked SNR is: ~1 when
      the masked frames pin down a rank-1 target signature well above the
      noise, ~0 when R_tgt is just scaled noise (no measurable target
      direction), so downstream gating can prefer a geometric fallback.
    """
    M = R_noise.shape[-1]
    tr_n = jnp.trace(R_noise.real, axis1=-2, axis2=-1)
    Rl = R_noise + (load * tr_n + eps)[..., None, None] * jnp.eye(
        M, dtype=R_noise.dtype
    )
    if M == 2:
        # A = Rl^-1 R_tgt, column by column through the closed-form solve.
        A = jnp.stack(
            [
                solve_2x2_hermitian(Rl, R_tgt[..., :, 0]),
                solve_2x2_hermitian(Rl, R_tgt[..., :, 1]),
            ],
            axis=-1,
        )
        # Generalized eigenvalues of the PSD pencil (real >= 0 in exact
        # arithmetic; |.| guards numerical residue) -> masked-SNR
        # separation.
        tr_a = A[..., 0, 0] + A[..., 1, 1]
        det_a = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        disc = jnp.sqrt(tr_a * tr_a - 4.0 * det_a + 0j)
        lam_hi = jnp.abs(0.5 * (tr_a + disc))
        lam_lo = jnp.abs(0.5 * (tr_a - disc))
        hi = jnp.maximum(lam_hi, lam_lo)
        lo = jnp.minimum(lam_hi, lam_lo)
        conf = (hi - lo) / (hi + lo + eps)
        v = eig_principal_2x2(A)
    else:
        # M-mic generalization (no reference counterpart): principal
        # generalized eigenvector by whitened power iteration on the
        # trace-normalized pencil; for a rank-1 target (R_tgt ~ s a a^H)
        # the principal v satisfies Rl v ~ a, so the de-whitening below
        # recovers the RTF exactly as in the 2x2 path.
        t_n = jnp.maximum(tr_n / M, 1e-30)
        # Floor the target trace RELATIVE to the noise trace: silent
        # masked bins carry absolutely tiny R_tgt, and dividing by an
        # absolute 1e-30 floor would blow entries past f32 range
        # (inf -> NaN). Relative flooring keeps them ~0 instead, which
        # the power iteration's collapse guard handles.
        t_t = jnp.maximum(
            jnp.trace(R_tgt.real, axis1=-2, axis2=-1) / M, 1e-12 * t_n
        )
        v = gev_principal_power(
            (R_tgt / t_t[..., None, None]).astype(Rl.dtype),
            Rl / t_n[..., None, None],
        )
        # Confidence = separation of the principal generalized eigenvalue
        # from the MEAN of the remaining spectrum: lam1 by Rayleigh
        # quotient, the rest from trace(Rl^-1 R_tgt) - lam1. At M=2 this
        # is exactly (hi-lo)/(hi+lo) above.
        Rt_v = jnp.einsum("...ij,...j->...i", R_tgt, v)
        Rl_v = jnp.einsum("...ij,...j->...i", Rl, v)
        num = jnp.real(jnp.sum(jnp.conj(v) * Rt_v, axis=-1))
        den = jnp.real(jnp.sum(jnp.conj(v) * Rl_v, axis=-1))
        lam1 = jnp.maximum(num / (den + eps), 0.0)
        cols = jnp.stack(
            [
                solve_hermitian_small(Rl, R_tgt[..., :, i])[..., i]
                for i in range(M)
            ],
            axis=-1,
        )
        tr_a = jnp.maximum(jnp.real(jnp.sum(cols, axis=-1)), 0.0)
        rest = jnp.maximum(tr_a - lam1, 0.0) / (M - 1)
        conf = (lam1 - rest) / (lam1 + rest + eps)
    a = jnp.einsum("...ij,...j->...i", Rl, v)

    # Reference-mic normalization with a phase-preserving magnitude floor.
    a0 = a[..., 0]
    mag = jnp.abs(a0)
    phase = a0 / jnp.maximum(mag, eps)
    nrm = jnp.sqrt(jnp.sum(jnp.abs(a) ** 2, axis=-1))
    a0_safe = phase * jnp.maximum(mag, ref_floor * jnp.maximum(nrm, eps))
    return a / a0_safe[..., None], conf


def rtf_mvdr_beamform(
    Y: jnp.ndarray,
    noise_mask: jnp.ndarray,
    freqs_hz: jnp.ndarray,
    target_mask: jnp.ndarray | None = None,
    d_fallback: jnp.ndarray | None = None,
    sigma: float = 1e-7,
    hp_cutoff_hz: float = 100.0,
    conf_thresh: float = 0.7,
    mask_floor: float = 0.0,
    apply_post_filter: bool = True,
) -> jnp.ndarray:
    """Masked MVDR steered by the estimated RTF instead of the plane-wave
    model. Y (..., M, F, T) -> (..., F, T).

    Same covariance -> weights -> apply chain as azoom.beam.mvdr (one fused
    XLA program), with the steering swapped for the measured one. Bins whose
    masked SNR is too isotropic to trust (conf < ``conf_thresh``) fall back
    to ``d_fallback`` (the geometric steering) when provided; with no
    fallback the beamformer needs no geometry information at all.

    The default gate is deliberately conservative: on the reference's real
    1 cm fixture with learned masks, SIR improvement is MONOTONE in
    conf_thresh (+22.7 dB at 0.2 -> +24.6 at 0.99, vs +24.65 for pure
    geometric steering) — measured RTFs never beat a correct geometric
    model, they only approach it. If you pass a fallback you evidently
    know the geometry, so the RTF should only override it at bins where
    the data speaks clearly; 0.7 keeps the synthetic-scene parity (within
    ~1 dB everywhere) while giving up ~1 dB at most on real fixtures.
    With no fallback the threshold is irrelevant.
    ``target_mask`` semantics: when omitted, the complement of
    ``noise_mask`` is used for the covariance split ONLY and no spectral
    post-filter is applied (pure beamforming — the caller owns any
    masking). When passed explicitly, it is both the covariance split and
    the spectral post-filter (floored by ``mask_floor``), matching how
    the learned pipeline drives masked_mvdr; ``apply_post_filter=False``
    keeps the covariance split but skips the multiply (the harmonic-
    regeneration path owns the gain, azoom.beam.postfilter).
    """
    tgt = 1.0 - noise_mask if target_mask is None else target_mask
    R_n = masked_covariance(Y, noise_mask)
    R_t = masked_covariance(Y, tgt)
    a, conf = rtf_from_covariances(R_t, R_n)
    if d_fallback is not None:
        d = jnp.where((conf >= conf_thresh)[..., None], a, d_fallback)
    else:
        d = a
    w = mvdr_weights(R_n, d, sigma=sigma)
    S = apply_weights(w, Y)
    keep = (freqs_hz >= hp_cutoff_hz)[:, None]
    S = jnp.where(keep, S, 0.0)
    if target_mask is not None and apply_post_filter:
        gain = (
            jnp.maximum(target_mask, mask_floor) if mask_floor > 0
            else target_mask
        )
        S = S * gain
    return S

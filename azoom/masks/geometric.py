"""Blind geometric (inter-channel phase difference) masks.

TPU-native equivalent of the hard IPD mask in
rt_av_zoom/core/masked_mvdr.py:37-46: TF bins whose inter-channel phase
difference deviates from the target direction's expected IPD are flagged as
noise-dominated. Also implements the reference roadmap's "visual-guided
covariance gating" (TODO:12): the camera's field of view gates which TF
bins feed the noise spatial covariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ipd", "hard_geometric_noise_mask", "fov_noise_gate", "apply_fov_gate"]


def ipd(Y: jnp.ndarray, pair_mode: str = "mean") -> jnp.ndarray:
    """Inter-channel phase difference of an STFT Y (..., M, F, T) ->
    (..., F, T).

    M = 2 keeps the reference's raw angle difference
    angle(Y0) - angle(Y1) (range (-2pi, 2pi) — masked_mvdr.py:41's
    convention, which the thresholds downstream were tuned against).
    M > 2 with ``pair_mode='mean'`` returns the principal-value phase of
    the cross-spectrum coherently averaged over all adjacent pairs (same
    spacing on a uniform array -> same IPD plus independent noise; the
    same (M-1)-fold average the DOA histogram and the physics features
    use). ``pair_mode='first'`` measures the FIRST pair alone — REQUIRED
    for explicit non-uniform geometries, where heterogeneous baselines
    measure different phases and averaging them is inconsistent with any
    single pair's expected IPD (ADVICE r4). Every M-general consumer
    wraps or thresholds the value, so the principal-value range is
    compatible."""
    if Y.shape[-3] == 2:
        return jnp.angle(Y[..., 0, :, :]) - jnp.angle(Y[..., 1, :, :])
    if pair_mode == "first":
        cross = Y[..., 0, :, :] * jnp.conj(Y[..., 1, :, :])
    else:
        cross = jnp.mean(
            Y[..., :-1, :, :] * jnp.conj(Y[..., 1:, :, :]), axis=-3
        )
    return jnp.angle(cross + 1e-20)


def hard_geometric_noise_mask(
    Y: jnp.ndarray,
    threshold: float = 0.0,
    floor: float = 0.01,
) -> jnp.ndarray:
    """Hard IPD noise mask: 1.0 where |IPD| > threshold else ``floor``.

    With the reference's broadside target (90 deg) the expected target IPD is
    zero, so any phase deviation marks interference (masked_mvdr.py:41-45).
    """
    phase_diff = ipd(Y)
    return jnp.where(jnp.abs(phase_diff) > threshold, 1.0, floor).astype(jnp.float32)


def ipd_deviation_noise_mask(
    Y: jnp.ndarray,
    expected_ipd: jnp.ndarray,
    width: float = 0.5,
    pair_mode: str = "mean",
) -> jnp.ndarray:
    """Soft geometric mask from deviation against an expected per-bin IPD
    (e.g. a steered non-broadside target): sigmoid-shaped in the wrapped
    phase distance. Generalizes the hard mask to arbitrary steering
    angles. Callers whose ``expected_ipd`` comes from the first pair's
    delays on an explicit non-uniform geometry must pass
    ``pair_mode='first'`` so the measurement matches the expectation."""
    diff = ipd(Y, pair_mode=pair_mode) - expected_ipd[..., :, None]
    # Wrap to (-pi, pi] without complex math (eager complex exp is
    # unimplemented on some TPU runtimes).
    dev = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.clip(jnp.abs(dev) / (width * jnp.pi), 0.0, 1.0).astype(jnp.float32)


def fov_noise_gate(
    Y: jnp.ndarray,
    center_deg: float | jnp.ndarray,
    fov_deg: float | jnp.ndarray,
    mic_dist: float,
    fs: int,
    c: float = 343.0,
    softness_deg: float = 10.0,
    positions: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Visual-guided covariance gate (reference roadmap TODO:12).

    The camera's zoom region defines what counts as "target": per-bin DOA
    estimates (azoom.masks.duet.bin_doa) are scored against the field of
    view [center - fov/2, center + fov/2].

    Returns ``(gate, protect, valid)``, all (..., F, T):
      * ``gate`` in [0, 1] — outside-the-FOV score (1 = confidently
        interference): these bins enter the noise covariance at full
        weight even when a mask net misses them.
      * ``protect`` in [0, 1] — a protection cone of ``min(fov/2, 15)``
        degrees around the look direction: bins whose spatial cue lands
        inside it are *excluded* from the noise covariance, preventing
        MPDR-style target self-cancellation when the camera direction is
        only approximately right. (The cap keeps a wide FOV from vetoing
        the net everywhere — "inside a wide FOV" carries no target
        evidence, but "within 15 degrees of the look direction" does.)
      * ``valid`` — bins with a usable spatial cue (below the aliasing
        limit, physical |cos| <= 1); invalid bins defer to the mask net.

    Combine with :func:`apply_fov_gate`; plumbed end to end by
    :func:`azoom.pipelines.learned.learned_enhance` (``fov_deg``).
    """
    from azoom.masks.duet import bin_doa

    if positions is not None:
        # Arbitrary geometry (round 4): the per-bin IPD of the first mic
        # pair measures the angle psi between the DOA and the PAIR
        # BASELINE (length |dp|, orientation phi in the steering plane),
        # not the azimuth itself: cos(theta - phi) = cos(psi). Score the
        # FOV against the CLOSER of the two candidates theta = phi +/-
        # psi — the camera look direction resolves the pair's intrinsic
        # front-back ambiguity.
        from azoom.dsp.delays import positions_2d

        p = positions_2d(2, mic_dist, positions)
        dp = p[0] - p[1]
        eff_dist = jnp.sqrt(jnp.sum(dp**2)) + 1e-9
        phi = jnp.rad2deg(jnp.arctan2(dp[1], dp[0]))
        psi, valid = bin_doa(Y[..., :2, :, :], eff_dist, fs, c)
        # Circular distance per candidate: phi +/- psi lives on the full
        # circle (e.g. a -y baseline has phi = -90), so a raw difference
        # against center_deg can read ~360 - true for an on-center target
        # and the gate would suppress it (ADVICE r4). Wrap to [-180, 180).
        def circ(a):
            return jnp.abs(jnp.mod(a + 180.0, 360.0) - 180.0)

        dev = jnp.minimum(
            circ(phi + psi - center_deg), circ(phi - psi - center_deg)
        )
    else:
        theta, valid = bin_doa(Y, mic_dist, fs, c)
        dev = jnp.abs(theta - center_deg)
    gate = jax.nn.sigmoid((dev - 0.5 * fov_deg) / softness_deg)
    cone = jnp.minimum(0.5 * fov_deg, 15.0)
    protect = jax.nn.sigmoid((cone - dev) / softness_deg)
    return gate.astype(jnp.float32), protect.astype(jnp.float32), valid


def apply_fov_gate(
    noise_mask: jnp.ndarray,
    gate: jnp.ndarray,
    protect: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Combine a mask-net noise mask with the visual gate.

    Valid-cue bins: ``clip(max(noise, gate) - protect, 0, 1)`` — outside
    bins are added to the noise covariance, protection-cone bins are
    removed from it, everything else keeps the net's decision. Invalid
    bins keep the net's decision unchanged.
    """
    gated = jnp.clip(jnp.maximum(noise_mask, gate) - protect, 0.0, 1.0)
    return jnp.where(valid, gated, noise_mask)

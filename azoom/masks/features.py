"""Input features for learned mask estimation.

Rebuilds the reference's two feature generations, channels-LAST (TPU/XLA's
native conv layout), batched over leading dims:

  * 2-channel: log-magnitude (mic 0) + raw IPD
    (model_training.py:85-87, resnet_model_mvdr/inference.py:161-166).
  * 4-channel "physics-aware": log-magnitude + sin(IPD) + cos(IPD) +
    normalized frequency coordinate map
    (Final_pipeline/src/inference.py:117-127). sin/cos removes the phase
    wrap discontinuity; the freq map gives the conv net absolute frequency
    position despite being frequency-translation-invariant.

Geometry adaptation (``ipd_scale``): the IPD at spacing d for a source at
azimuth theta is -2 pi f d cos(theta) / c — linear in d. A net trained at
spacing d_train can therefore serve any other array by rescaling the
measured IPD by d_train / d_actual, which presents phase cues exactly as
they would appear at the training geometry. The rescale is EXACT as long
as the measured IPD is unwrapped, i.e. below the *actual* array's spatial
aliasing limit c / (2 d f) — for arrays smaller than the training spacing
(the common product case: d_actual = 1 cm vs d_train = 4 cm) that covers
the whole band. ipd_scale=1 is a no-op, so trained artifacts are
unaffected at their native geometry.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["logmag_ipd_features", "physics_aware_features"]

_EPS = 1e-7


def logmag_ipd_features(
    Y: jnp.ndarray, ipd_scale: float | jnp.ndarray = 1.0,
    pair_mode: str = "mean",
) -> jnp.ndarray:
    """STFT (..., M, F, T) -> features (..., F, T, 2):
    [log|Y0|, IPD * ipd_scale].

    M == 2 with ipd_scale == 1 keeps the training-time convention (raw
    angle difference, range (-2pi, 2pi) — what every bundled 2-ch
    artifact was trained on). ipd_scale != 1 is geometry adaptation:
    there the raw difference is unusable (its +-2pi phase-straddle
    jitter would be amplified by the scale into wild feature values), so
    the cue is the principal-value IPD (angle of Y0*conj(Y1)) scaled and
    re-wrapped to [-pi, pi) — exactly the principal-value IPD the
    training-spacing array would have measured for the same source,
    below the actual array's aliasing limit.

    M > 2 always uses the principal-value phase of the cross-spectrum
    coherently averaged over all adjacent pairs (same spacing on a
    uniform array). The principal-value range is a narrowing, not a
    shift, of the raw-difference training distribution, and the
    (M-1)-fold phase-noise average dominates: measured with the bundled
    2-ch `fpu_multigeo` at M=4/K=3, +1.96 dB reverb and +2.87 dB under
    10 dB sensor noise vs reading the first pair raw (RESULTS.md)."""
    logmag = jnp.log(jnp.abs(Y[..., 0, :, :]) + _EPS)
    unit_scale = isinstance(ipd_scale, (int, float)) and float(ipd_scale) == 1.0
    if Y.shape[-3] == 2 and unit_scale:
        ipd = jnp.angle(Y[..., 0, :, :]) - jnp.angle(Y[..., 1, :, :])
    else:
        cross = _cross_spectrum(Y, pair_mode)
        ipd = jnp.angle(cross + 1e-20)
        if not unit_scale:
            ipd = jnp.mod(ipd * ipd_scale + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.stack([logmag, ipd], axis=-1)


def _cross_spectrum(Y: jnp.ndarray, pair_mode: str) -> jnp.ndarray:
    """IPD cross-spectrum. ``pair_mode``:
      'mean'  — coherent average over all adjacent pairs. Correct ONLY
        for uniform linear arrays (adjacent pairs share the baseline, so
        they measure the same IPD plus independent noise).
      'first' — the first mic pair alone. REQUIRED for explicit
        (non-uniform) geometries: heterogeneous baselines measure
        different phases and averaging them corrupts the cue (measured
        -3.3 dB mean on the round-4 rectangle campaign before this
        mode existed)."""
    if pair_mode == "first":
        return Y[..., 0, :, :] * jnp.conj(Y[..., 1, :, :])
    if pair_mode != "mean":
        raise ValueError(f"pair_mode must be 'mean' or 'first', got {pair_mode!r}")
    return jnp.mean(Y[..., :-1, :, :] * jnp.conj(Y[..., 1:, :, :]), axis=-3)


def physics_aware_features(
    Y: jnp.ndarray, ipd_scale: float | jnp.ndarray = 1.0,
    pair_mode: str = "mean",
) -> jnp.ndarray:
    """STFT (..., M, F, T) -> features (..., F, T, 4):
    [log|Y0|, sin(ipd_scale*IPD), cos(ipd_scale*IPD), freq_map].

    At M > 2 the cross-spectrum is coherently averaged over all adjacent
    pairs of the uniform array (they share the spacing, so they measure
    the same IPD plus independent noise — the same (M-1)-fold average the
    DOA histogram uses, azoom.localize.srp). sin/cos are taken of the
    averaged phase, so the features are bit-identical at M = 2 and the
    2-mic-trained artifacts see a cleaner version of exactly the cue
    distribution they were trained on."""
    logmag = jnp.log(jnp.abs(Y[..., 0, :, :]) + _EPS)
    cross = _cross_spectrum(Y, pair_mode)
    if isinstance(ipd_scale, (int, float)) and float(ipd_scale) == 1.0:
        # sin/cos of IPD without computing angles: Y0 * conj(Y1) has
        # phase = IPD (cheaper: no arctan on the hot path).
        mag = jnp.abs(cross) + 1e-12
        sin_ipd = cross.imag / mag
        cos_ipd = cross.real / mag
    else:
        ipd = jnp.angle(cross + 1e-20) * ipd_scale
        sin_ipd = jnp.sin(ipd)
        cos_ipd = jnp.cos(ipd)
    F = Y.shape[-2]
    fmap = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, F, dtype=jnp.float32)[:, None], logmag.shape[-2:]
    )
    fmap = jnp.broadcast_to(fmap, logmag.shape)
    return jnp.stack([logmag, sin_ipd, cos_ipd, fmap], axis=-1)

"""Learned-mask enhancement — the flagship production inference path.

TPU-native rebuild of the model-driven pipelines (gens 2-4):
full_audio_generating_pipeline/inference.py:88-156,
resnet_model_mvdr/inference.py:152-274, tf_lite_version/inference.py:245-393,
Final_pipeline/src/inference.py:144-237.

Where the reference crosses a C++ boundary into a TFLite interpreter per
chunk and then loops frequency bins in Python, here the *entire* chain —
STFT, feature extraction, U-Net mask inference, masked covariance, MVDR or
hard-null beamforming, spectral post-filter, iSTFT — is one fused XLA
program. The NN and the DSP share one graph, so XLA overlaps the conv
layers (MXU) with the covariance/solve math (VPU) and nothing round-trips
through host memory.

Chunked streaming uses azoom.stream.chunker: the chunk axis is vmapped (and
shardable across chips), reproducing the reference's 2 s / 50 % overlap-add
semantics.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from azoom.beam.mvdr import masked_mvdr
from azoom.beam.nullsteer import hybrid_hard_null_beamform
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.masks.features import logmag_ipd_features, physics_aware_features
from azoom.models.unet import pad_frames
from azoom.stream.chunker import streaming_enhance

__all__ = ["predict_mask", "learned_enhance", "learned_enhance_streaming"]


def predict_mask(
    model,
    variables: Any,
    Y: jnp.ndarray,
    feature_kind: str = "logmag_ipd",
    pad_multiple: int = 16,
    ipd_scale: float | jnp.ndarray = 1.0,
    pair_mode: str = "mean",
) -> jnp.ndarray:
    """STFT (..., M, F, T) -> target mask (..., F, T) via the mask net.

    Handles feature extraction, time padding to the U-Net pool factor, a
    batch axis if the input is unbatched, and cropping back. ``ipd_scale``
    rescales phase cues to the net's training geometry; ``pair_mode``
    selects the IPD cross-spectrum pairing ('first' for non-uniform
    explicit geometries — see azoom.masks.features).
    """
    feats = (
        logmag_ipd_features(Y, ipd_scale, pair_mode=pair_mode)
        if feature_kind == "logmag_ipd"
        else physics_aware_features(Y, ipd_scale, pair_mode=pair_mode)
    )
    unbatched = feats.ndim == 3
    if unbatched:
        feats = feats[None]
    lead = feats.shape[:-3]
    feats = feats.reshape((-1,) + feats.shape[-3:])
    feats, t_orig = pad_frames(feats, pad_multiple)
    mask = model.apply(variables, feats)  # (B, F, Tp)
    mask = mask[..., :t_orig]
    mask = mask.reshape(lead + mask.shape[-2:])
    return mask[0] if unbatched else mask


@functools.partial(
    jax.jit,
    static_argnames=("model", "cfg", "beamformer", "feature_kind", "length",
                     "use_pallas", "dsp_precision", "n_nulls", "steer_align",
                     "harmonic_regen"),
)
def learned_enhance(
    mixture: jnp.ndarray,
    model,
    variables: Any,
    cfg: PipelineConfig,
    beamformer: str = "mvdr",
    feature_kind: str = "logmag_ipd",
    mask_floor: float = 0.05,
    length: int | None = None,
    use_pallas: bool = False,
    fov_deg: float | jnp.ndarray | None = None,
    steer_deg: float | jnp.ndarray | None = None,
    train_mic_dist: float | None = None,
    dsp_precision: str = "exact",
    n_nulls: int = 1,
    steer_align: bool = True,
    harmonic_regen: bool = False,
) -> jnp.ndarray:
    """Whole-signal learned enhancement: (..., M, n) -> (..., n).

    ``n_nulls``: hard nulls placed by the 'hard_null' beamformer at
    M > 2 (azoom.beam.nullsteer — an M-mic array pointed at K interferers
    wants n_nulls=K); ignored at M = 2 and by the other beamformers.

    beamformer: 'mvdr' (tf_lite_version/inference.py batch_mvdr path),
    'hard_null' (Final_pipeline hybrid path, <200 Hz bypass + cond
    fallback), 'rmvb' (robust Capon — steering-corrected MVDR for
    approximate look directions, azoom.beam.rmvb), or 'wpd' (joint
    dereverb + beamform convolutional filter, azoom.beam.wpd — the
    one-solve replacement for the reference's WPE->MVDR cascade on
    reverberant input). Post-filter multiplies
    by the predicted mask, floored
    (full inference.py:116) for 'mvdr', raw (Final inference.py:219) for
    'hard_null'. ``use_pallas`` routes the MVDR stage through the fused
    TPU kernel (azoom.pallas) — ~2.7x faster than the XLA path on v5e and
    computed in full f32 (XLA's default TPU matmul precision is lower).
    ``fov_deg`` enables visual-guided covariance gating (roadmap TODO:12):
    TF bins whose spatial cue is confidently outside the camera's field of
    view are added to the noise covariance even when the mask net misses
    them. ``fov_deg`` and ``steer_deg`` are traced (not static), so a
    continuously-changing camera zoom/direction reuses one compiled
    program; ``steer_deg`` overrides ``cfg.angle_target_deg`` as the look
    direction (e.g. a DOA estimate from azoom.pipelines.autosteer).
    ``dsp_precision``: 'exact' (default) runs the TPU matmul-DFT STFT/iSTFT
    at HIGHEST precision; 'fast' uses single-pass bf16 MXU passes (~-54 dB
    error floor — measured no SIR cost at serving; see RESULTS.md).
    ``harmonic_regen`` replaces the plain mask multiply with the HRNR
    stage-2 Wiener gain (azoom.beam.postfilter — the reference's
    unfinished roadmap item TODO:9): the half-wave-rectified stage-1
    signal regenerates target harmonics the mask suppressed, re-opening
    those bins in proportion to the evidence instead of the fixed floor.
    ``train_mic_dist`` enables geometry adaptation: give the spacing the
    mask net was trained at (e.g. 0.04 for the bundled artifacts) and its
    phase features are rescaled by train_mic_dist / cfg.mic_dist, so one
    artifact serves arrays of any (smaller) spacing at full quality
    (azoom.masks.features docstring; measured on the reference's real
    1 cm array in RESULTS.md "geometry adaptation").
    ``steer_align`` (default True) rotates the STFT by the conjugate
    steering vector BEFORE feature extraction, so the look direction
    appears broadside to the mask net. Every bundled artifact was trained
    with the target at broadside (train/data.py TRAIN_ANGLES); without
    alignment the net ignores ``steer_deg`` and "zoom to theta"
    degenerates to "zoom to whoever is nearest broadside" — with an
    interferer AT broadside, steering to a 60 deg target scores -1.1 dB
    unaligned vs +25.7 dB aligned (RESULTS.md "steer-aligned features").
    Exact no-op at steer = 90 deg, so broadside behavior is unchanged.
    Composes with geometry adaptation: the rotation happens at the actual
    array's phases, then ``ipd_scale`` maps the residual to the training
    geometry.
    """
    cfg = cfg.for_input(mixture)
    n = mixture.shape[-1]
    length = n if length is None else length
    steer = cfg.angle_target_deg if steer_deg is None else steer_deg
    # Explicit (possibly non-uniform) geometry: the nets were trained on
    # a uniform linear pair, so (a) IPD features must come from the FIRST
    # pair only — averaging heterogeneous baselines corrupts the cue
    # (features._cross_spectrum) — (b) geometry adaptation rescales by
    # the first pair's EFFECTIVE baseline length, and (c) steer-align
    # must not take the linear broadside shortcut: rotating by the true
    # positions' steering vector is what zeroes the target's first-pair
    # IPD into the broadside training distribution.
    pair_mode = "mean"
    d_feat = cfg.mic_dist
    if cfg.mic_positions is not None:
        pair_mode = "first"
        # static config tuple -> plain Python math (trace-time constant)
        p0 = cfg.mic_positions[0] + (0.0, 0.0)
        p1 = cfg.mic_positions[1] + (0.0, 0.0)
        d_feat = ((p0[0] - p1[0]) ** 2 + (p0[1] - p1[1]) ** 2) ** 0.5
    ipd_scale = 1.0 if train_mic_dist is None else train_mic_dist / d_feat

    Y = stft(mixture, cfg.n_fft, cfg.hop, precision=dsp_precision)
    Y_feat = Y
    # Alignment at broadside is a no-op by design; when the steer is a
    # static 90.0 (the default cfg / sweeps), skip the rotation entirely
    # rather than multiply by a cos(90 deg)-noise unit phasor. (Linear
    # arrays only: an explicit geometry's y-offsets make broadside a
    # real rotation.)
    if (isinstance(steer, (int, float)) and float(steer) == 90.0
            and cfg.mic_positions is None):
        steer_align = False
    if steer_align:
        freqs_al = rfft_freqs(cfg.n_fft, cfg.fs)
        d_al = steering_vector(
            freqs_al, steer, cfg.mic_dist, cfg.c, cfg.n_mics,
            positions=cfg.geometry(),
        )  # (..., F, M)
        # Per-channel unit-modulus rotation: the target's inter-channel
        # phases become zero (broadside as seen by the features); channel
        # magnitudes — hence logmag — are untouched.
        Y_feat = Y * jnp.conj(d_al).swapaxes(-1, -2)[..., None]
    tgt_mask = predict_mask(
        model, variables, Y_feat, feature_kind, ipd_scale=ipd_scale,
        pair_mode=pair_mode,
    )
    noise_mask = 1.0 - tgt_mask
    if fov_deg is not None:
        from azoom.masks.geometric import apply_fov_gate, fov_noise_gate

        gate, protect, valid = fov_noise_gate(
            Y, steer, fov_deg, cfg.mic_dist, cfg.fs, cfg.c,
            positions=cfg.geometry(),
        )
        noise_mask = apply_fov_gate(noise_mask, gate, protect, valid)
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)

    # With harmonic_regen the branches produce the UNMASKED beamformed
    # spectrum S_bf plus the stage-1 gain g1; the HRNR stage below replaces
    # the plain multiply (azoom.beam.postfilter — reference roadmap TODO:9).
    g1 = jnp.maximum(tgt_mask, mask_floor) if mask_floor > 0 else tgt_mask

    if beamformer == "mvdr":
        d = steering_vector(freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        mvdr_fn = masked_mvdr
        if use_pallas and cfg.n_mics == 2:
            # The fused kernel is specialized to the 2-mic closed form;
            # M > 2 arrays take the XLA path (unrolled-Cholesky solve).
            from azoom.pallas.mvdr_kernel import masked_mvdr_pallas as mvdr_fn
        S = mvdr_fn(
            Y,
            noise_mask,
            d,
            freqs,
            target_mask=None if harmonic_regen else tgt_mask,
            mask_floor=mask_floor,
            sigma=cfg.sigma,
            hp_cutoff_hz=cfg.hp_cutoff_hz,
        )
    elif beamformer == "rmvb":
        from azoom.beam.rmvb import rmvb_beamform

        d = steering_vector(freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        S = rmvb_beamform(
            Y, noise_mask, d, freqs,
            sigma=cfg.sigma, hp_cutoff_hz=cfg.hp_cutoff_hz,
        )
        if not harmonic_regen:
            S = S * jnp.maximum(tgt_mask, mask_floor)
    elif beamformer == "rtf":
        from azoom.beam.rtf import rtf_mvdr_beamform

        # Geometry-free steering: the covariance-whitened RTF estimate
        # replaces the plane-wave model; the geometric d only serves as
        # the low-confidence fallback, so 'rtf' tolerates wrong mic_dist /
        # look angles AND reverberant transfer functions the anechoic
        # model can't describe (azoom.beam.rtf).
        d = steering_vector(freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        S = rtf_mvdr_beamform(
            Y,
            noise_mask,
            freqs,
            target_mask=tgt_mask,
            d_fallback=d,
            sigma=cfg.sigma,
            hp_cutoff_hz=cfg.hp_cutoff_hz,
            mask_floor=mask_floor,
            apply_post_filter=not harmonic_regen,
        )
    elif beamformer == "wpd":
        from azoom.beam.wpd import masked_wpd

        d = steering_vector(freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics, positions=cfg.geometry())
        # Joint dereverb + beamform: the convolutional filter replaces the
        # reference's WPE -> MVDR cascade (dereverb.py -> oracle_reverb.py)
        # with one weighted solve; the FOV gate composes through the
        # target-PSD weighting (gated bins count as noise).
        # sigma here is trace-relative loading on the stacked covariance
        # (wpd.py), a different animal from cfg.sigma's absolute-loading
        # zoom knob — keep the module default.
        if harmonic_regen:
            from azoom.beam.wpd import wpd_beamform

            # masked_wpd = wpd_beamform + the floored mask gain; the HRNR
            # stage owns the gain, so take the unmasked beamformer output
            # and hand it g1 = the same (FOV-gated) floored mask.
            S = wpd_beamform(
                Y, 1.0 - noise_mask, d, freqs,
                hp_cutoff_hz=cfg.hp_cutoff_hz,
            )
            g1 = (
                jnp.maximum(1.0 - noise_mask, mask_floor)
                if mask_floor > 0 else 1.0 - noise_mask
            )
        else:
            S = masked_wpd(
                Y,
                1.0 - noise_mask,
                d,
                freqs,
                hp_cutoff_hz=cfg.hp_cutoff_hz,
                mask_floor=mask_floor,
            )
    elif beamformer == "hard_null":
        d = steering_vector(
            freqs, steer, cfg.mic_dist, cfg.c, cfg.n_mics,
            positions=cfg.geometry(),
            normalize_phase=True,
        )
        null_fn = functools.partial(
            hybrid_hard_null_beamform, n_nulls=n_nulls
        )
        if use_pallas and cfg.n_mics == 2:
            # The fused kernel is specialized to the 2-mic closed form
            # (single null by construction); M > 2 takes the XLA path.
            from azoom.pallas.nullsteer_kernel import (
                hybrid_hard_null_pallas as null_fn,
            )
        # The null beamformer derives its interference covariance from
        # (1 - its mask argument), so the FOV-gated noise mask enters as
        # 1 - noise_mask; the spectral post-filter stays the raw net mask.
        S = null_fn(Y, 1.0 - noise_mask, d, freqs)
        g1 = tgt_mask  # raw, un-floored (Final inference.py:219)
        if not harmonic_regen:
            S = S * g1
    else:
        raise ValueError(f"unknown beamformer {beamformer!r}")

    if harmonic_regen:
        from azoom.beam.postfilter import harmonic_regeneration

        S = harmonic_regeneration(
            S, g1, cfg.n_fft, cfg.hop, length=n, precision=dsp_precision
        )

    return istft(S, cfg.n_fft, cfg.hop, length=length,
                 precision=dsp_precision)


def learned_enhance_streaming(
    mixture: jnp.ndarray,
    model,
    variables: Any,
    cfg: PipelineConfig,
    beamformer: str = "mvdr",
    feature_kind: str = "logmag_ipd",
    train_mic_dist: float | None = None,
    n_nulls: int = 1,
    harmonic_regen: bool = False,
) -> jnp.ndarray:
    """Chunked 2 s / 50 % overlap-add variant for arbitrary-length audio —
    the reference's real-time execution model (Final inference.py:171-233)."""

    def process(chunk):
        return learned_enhance(
            chunk, model, variables, cfg, beamformer, feature_kind,
            train_mic_dist=train_mic_dist, n_nulls=n_nulls,
            harmonic_regen=harmonic_regen,
        )

    hop = cfg.win_size // 2
    return streaming_enhance(mixture, process, cfg.win_size, hop)

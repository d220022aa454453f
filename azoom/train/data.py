"""On-the-fly training data pipeline — scene synthesis IS the input pipeline.

The reference's key structural trick (SURVEY.md §3.4): mixtures are never
materialized as a dataset; `SpatialDataset.__getitem__` synthesizes a fresh
3-source anechoic mixture per sample inside DataLoader workers
(model_training.py:49-92). TPU-native version: the whole batch is ONE
jitted function of a PRNG key — synthesis, STFT, features, and oracle
labels all run on device, so the input pipeline can never starve the MXU.

Geometry matches the reference: target at 90 deg, interferers at 40 and
130 deg (model_training.py:66), 2 s crops, N_FFT=1024 hop 512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from azoom.config import PipelineConfig
from azoom.masks.features import logmag_ipd_features, physics_aware_features
from azoom.masks.oracle import ibm_target_mask
from azoom.sim.farfield import make_scene
from azoom.sim.signals import interferer_signal, speech_like
from azoom.dsp.stft import stft

__all__ = ["synth_batch", "mix_batch", "TRAIN_ANGLES"]

TRAIN_ANGLES = (90.0, 40.0, 130.0)  # target, int1, int2 (model_training.py:66)


@functools.partial(
    jax.jit,
    static_argnames=(
        "batch_size", "cfg", "feature_kind", "n_samples", "pad_multiple",
        "reverb", "reverb_max_order", "interferer_kind",
    ),
)
def synth_batch(
    key: jax.Array,
    batch_size: int,
    cfg: PipelineConfig,
    feature_kind: str = "logmag_ipd",
    n_samples: int = 32_000,
    angle_jitter_deg: float = 0.0,
    pad_multiple: int = 16,
    reverb: bool = False,
    reverb_max_order: int = 5,
    interferer_kind: str = "speech",
) -> dict:
    """One training batch, fully on device.

    ``interferer_kind`` selects the interferer source class ('speech',
    'babble', 'music', 'noise', or 'mixed' = uniform random class per
    interferer per scene — the non-speech robustness training axis;
    the target is always speech).

    Returns dict with:
      features: (B, F, T, C) float32 — C=2 ('logmag_ipd') or 4 ('physics');
        T zero-padded to a multiple of ``pad_multiple`` (the U-Net's total
        time-pool factor) so shapes stay static under jit.
      label:    (B, F, T) float32 oracle IBM target mask (padded frames are
        labeled 0 = noise, and the features there are silence).
      mixture:  (B, M, n) time-domain mixtures (for end-to-end eval).
      target_ref / interference_ref: (B, n) stems.
    """
    # Independent key streams for source synthesis and scene mixing —
    # passing the parent key to both would alias the split children
    # (threefry split(k, 3) children are a prefix of split(k, 4)'s), so
    # scene randomization would reuse the exact key streams that drew the
    # source waveforms.
    k_src, k_mix = jax.random.split(key)
    keys = jax.random.split(k_src, batch_size)

    def sources_of(k):
        k_t, k_i1, k_i2, k_f0 = jax.random.split(k, 4)
        # Distinct pitch registers per source, randomized per sample.
        f0s = jax.random.uniform(k_f0, (3,), minval=100.0, maxval=280.0)
        return jnp.stack([
            speech_like(k_t, n_samples, cfg.fs, f0s[0]),
            interferer_signal(k_i1, n_samples, cfg.fs, interferer_kind,
                              f0s[1]),
            interferer_signal(k_i2, n_samples, cfg.fs, interferer_kind,
                              f0s[2]),
        ])

    sources = jax.vmap(sources_of)(keys)  # (B, 3, n)
    return mix_batch(
        k_mix, sources, cfg, feature_kind,
        angle_jitter_deg=angle_jitter_deg, pad_multiple=pad_multiple,
        reverb=reverb, reverb_max_order=reverb_max_order,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "feature_kind", "pad_multiple", "reverb", "reverb_max_order",
    ),
)
def mix_batch(
    key: jax.Array,
    sources: jnp.ndarray,
    cfg: PipelineConfig,
    feature_kind: str = "logmag_ipd",
    angle_jitter_deg: float = 0.0,
    pad_multiple: int = 16,
    reverb: bool = False,
    reverb_max_order: int = 5,
) -> dict:
    """Training batch from GIVEN source signals (B, 3, n) — the corpus
    ingestion path: real recordings from azoom.sim.datasets.get_sources
    feed the same on-device scene mixing, features, and oracle labels as
    the synthetic pipeline (world.py:38-91's corpus role)."""
    batch_size = sources.shape[0]
    keys = jax.random.split(key, batch_size)

    def one(k, src):
        tgt, i1, i2 = src[0], src[1], src[2]
        if reverb:
            # Room-acoustics training scenes (image-source RIRs) — goes
            # beyond the reference, which trains anechoic-only
            # (model_training.py:66-77) and meets reverb only at inference.
            from azoom.config import RoomConfig
            from azoom.sim.scene import simulate_room_scene

            sc = simulate_room_scene(
                k, tgt, jnp.stack([i1, i2]), RoomConfig(),
                reverb=True, snr_db=50.0, fs=cfg.fs,
                max_order=reverb_max_order,
            )
        else:
            angles = jnp.asarray(TRAIN_ANGLES) + angle_jitter_deg * jax.random.uniform(
                k, (3,), minval=-1.0, maxval=1.0
            )
            sc = make_scene(
                tgt,
                jnp.stack([i1, i2]),
                angles[0],
                angles[1:],
                cfg.mic_dist,
                cfg.fs,
            )
        return sc["mixture"], sc["target_ref"], sc["interference_ref"]

    mix, tgt_ref, int_ref = jax.vmap(one)(keys, sources)

    Y = stft(mix, cfg.n_fft, cfg.hop)  # (B, M, F, T)
    S_t = stft(tgt_ref, cfg.n_fft, cfg.hop)
    S_i = stft(int_ref, cfg.n_fft, cfg.hop)

    if feature_kind == "logmag_ipd":
        feats = logmag_ipd_features(Y)
    elif feature_kind == "physics":
        feats = physics_aware_features(Y)
    else:
        raise ValueError(f"unknown feature_kind {feature_kind!r}")

    label = ibm_target_mask(S_t, S_i)
    pad_t = (-feats.shape[2]) % pad_multiple
    if pad_t:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        label = jnp.pad(label, ((0, 0), (0, 0), (0, pad_t)))

    return {
        "features": feats,
        "label": label,
        "mixture": mix,
        "target_ref": tgt_ref,
        "interference_ref": int_ref,
    }

"""Bundled pretrained mask estimators.

The reference ships its trained weights as git-LFS artifacts (which are
missing from the snapshot — .MISSING_LARGE_BLOBS); azoom bundles eight
trained int8 artifacts, all trained on-device on synthesized scenes and
carrying percentile-calibrated static activation scales for int8-MXU
serving (see each `_*_ARTIFACT` note below for its recipe and measured
numbers):

  fpu           — FreqPreservingUNet b32, logmag+IPD (anechoic)
  fpu_reverb    — room-scene-trained twin (reverb campaigns)
  fpu_multigeo  — spacing-robust fine-tune (real / mismatched arrays)
  deepfpu       — DeepFPU b32, physics 4-ch (the gen-4 twin)
  tpufpu        — the MXU-shaped full-width net (2.25x deepfpu)
  tpufpu_slim   — slim bottleneck (bneck=4): the distillation teacher,
                  ~1.3x tpufpu at equal-or-better held-out quality
  tpufpu_nano   — slim bottleneck + half-width decoder AND encoder
                  (dec_div=2, enc_div=2, 4.1M params), distilled from
                  tpufpu_slim: the serving flagship, 1.76x the slim
                  net's speed at matched-or-better quality everywhere
                  (including the real 1 cm fixture)
  crn_causal    — causal CRN for the 32-64 ms online path

``load_bundled(name)`` is the single dispatcher the CLIs and the
AudioZoom facade use. Quantization is downstream-lossless for weights
(24.85 vs 24.88 dB SIR float-vs-int8) and within 0.2 dB blind SIR for
full int8 compute (tests/test_int8_inference.py).
"""

from __future__ import annotations

from pathlib import Path

__all__ = [
    "bundled_artifact_path",
    "bundled_train_mic_dist",
    "load_bundled",
    "load_pretrained_fpu",
    "load_pretrained_deepfpu",
    "load_pretrained_tpufpu",
    "load_pretrained_tpufpu_slim",
    "load_pretrained_tpufpu_nano",
    "load_pretrained_fpu_reverb",
    "load_pretrained_fpu_multigeo",
    "load_pretrained_crn_causal",
]

_ASSETS = Path(__file__).resolve().parent.parent / "assets"
_FPU_ARTIFACT = _ASSETS / "fpu_b32_int8.npz"
# DeepFPU gen-4 twin: physics-aware 4-ch features, 10k steps with +/-3 deg
# angle jitter; held-out mask accuracy 0.849, blind SIR improvement
# ~+27.1 dB (int8).
_DEEPFPU_ARTIFACT = _ASSETS / "deepfpu_b32_phy_int8.npz"
# Reverb-robust FPU: trained on image-source room scenes (beyond the
# reference's anechoic-only training); on reverberant held-out scenes it
# gains ~+3 dB SIR over the anechoic-trained model (23.7 vs 20.8 dB at
# 8k steps).
_FPU_REVERB_ARTIFACT = _ASSETS / "fpu_b32_reverb_int8.npz"

# Causal CRN for the frame-latency online pipeline: +19.7 dB SIR fully
# causally (32-64 ms algorithmic latency), mask acc 0.84
# (10k steps, +/-3 deg angle jitter).
_CRN_CAUSAL_ARTIFACT = _ASSETS / "crn_causal_int8.npz"

# Mic-spacing-robust FPU: fpu_b32 fine-tuned 500 steps with the spacing
# alternating over {1, 2, 4, 8} cm per batch. Transfers to arrays the
# anechoic-trained model has never seen: +19.0 dB blind SIR on the
# reference repo's committed REAL-SPEECH mixture (data/inputs/
# test_mixture.wav, a 1 cm gen-1 array) vs +12.1 dB for fpu_b32, with no
# regression at the 4 cm training spacing (+26.6 vs +25.2 on synthetic
# scenes).
_FPU_MULTIGEO_ARTIFACT = _ASSETS / "fpu_b32_multigeo_int8.npz"

# MXU-shaped flagship: frequency space-to-depth TPUFPU (base=64, fold=4,
# physics features, 10k steps, +/-3 deg jitter). Same parameter count and
# held-out mask accuracy as deepfpu_b32_phy (0.846 vs 0.845) at 2.25x its
# inference speed on v5e — the conv grid runs at >= 64 channels on 4x
# fewer frequency rows, so every level fills the 128-lane MXU.
_TPUFPU_ARTIFACT = _ASSETS / "tpufpu_b64_phy_int8.npz"

# Slim-bottleneck serving flagship (round 3): same TPUFPU at bneck=4
# (bottleneck 256 channels, 8.1M vs 15.9M params, -32% MACs). The
# speed-of-light study showed the int8 net runs at the chip's matmul
# ceiling, so this buys its ~1.3x net speedup with FLOPs, not kernels.
# 20k steps, same recipe: held-out mask acc 0.852 (tpufpu: 0.849),
# blind reverb SIR +21.44 +/- 0.59 vs +21.05 +/- 0.60, anechoic
# +29.93 +/- 1.53 vs +30.60 +/- 1.84 (64 held-out scenes) — at or above
# the full-width artifact on every measured facet.
_TPUFPU_SLIM_ARTIFACT = _ASSETS / "tpufpu_b64s4_phy_int8.npz"

# Nano serving flagship (round 3, the end of the FLOP-cut frontier):
# bneck=4 + half-width decoder (dec_div=2) + half-width encoder
# (enc_div=2) — 4.1M params, net 12.2 ms vs the slim teacher's 21.5 at
# the bench shape (1.76x). Trained from scratch for 40k steps under
# soft-target distillation from tpufpu_slim (0.5*IBM + 0.5*teacher,
# scripts/train_eslim.py; at 20k steps the cut still cost -1.3 dB reverb
# — the thinner net needs the doubled budget). Measured vs the teacher:
# held-out acc 0.852 (= teacher), reverb +21.77 +/- 0.62 vs +21.45
# +/- 0.59, anechoic +30.09 +/- 1.37 vs +29.91 +/- 1.51, every
# interferer-kind and steer-error facet at or above, REAL 1 cm fixture
# geo-adapted int8 +24.68 vs +24.66 dB (autosteered blind +24.63).
# The intermediate dec_div=2-only study (artifact not bundled — strictly
# dominated by this one) is recorded in RESULTS.md.
_TPUFPU_NANO_ARTIFACT = _ASSETS / "tpufpu_b64s4d2e2_phy_int8.npz"

_PATHS = {
    "fpu": _FPU_ARTIFACT,
    "deepfpu": _DEEPFPU_ARTIFACT,
    "tpufpu": _TPUFPU_ARTIFACT,
    "tpufpu_slim": _TPUFPU_SLIM_ARTIFACT,
    "tpufpu_nano": _TPUFPU_NANO_ARTIFACT,
    "fpu_reverb": _FPU_REVERB_ARTIFACT,
    "fpu_multigeo": _FPU_MULTIGEO_ARTIFACT,
    "crn_causal": _CRN_CAUSAL_ARTIFACT,
}


def bundled_artifact_path(model: str = "fpu") -> Path | None:
    path = _PATHS[model]
    return path if path.exists() else None


# Mic spacing each artifact's phase features were trained at. Used for
# inference-time geometry adaptation (rescale measured IPD by
# train_dist / actual_dist — azoom.masks.features): serving tpufpu on the
# reference's real 1 cm array this lifts blind SIR from +13.6 to +24.4 dB
# (RESULTS.md round 3). fpu_multigeo is None: it was *trained* across
# spacings on unscaled features, so its cues must not be rescaled.
_TRAIN_MIC_DIST = {
    "fpu": 0.04,
    "fpu_reverb": 0.04,
    "fpu_multigeo": None,
    "deepfpu": 0.04,
    "tpufpu": 0.04,
    "tpufpu_slim": 0.04,
    "tpufpu_nano": 0.04,
    "crn_causal": 0.04,
}


def bundled_train_mic_dist(model: str) -> float | None:
    """Training spacing for geometry adaptation, or None for artifacts
    that must see raw (unscaled) phase features."""
    return _TRAIN_MIC_DIST[model]


def geo_adapt_dist(model: str, actual_mic_dist: float) -> float | None:
    """The ``train_mic_dist`` to pass to the learned pipelines for this
    (artifact, array) pairing, or None to serve raw features.

    Adaptation engages only for arrays SMALLER than the training spacing:
    there the IPD rescale is exact over the whole band (below the small
    array's aliasing limit) and recovers most of the mismatch loss
    (1 cm: +11.1 -> +27.7 dB synthetic, +13.6 -> +24.4 real speech). For
    larger arrays the measured IPD wraps where the training IPD would
    not, the rescale corrupts those bands, and the raw features already
    win (8 cm: raw +36.1 vs adapted +32.7) — so serve raw.
    """
    train = _TRAIN_MIC_DIST[model]
    if train is None or actual_mic_dist >= train:
        return None
    return train


def load_pretrained_fpu(quant: bool = False):
    """Returns (model, variables) for the bundled FreqPreservingUNet
    (logmag+IPD features), or raises FileNotFoundError. ``quant=True``
    serves it on the int8 MXU path (same checkpoint)."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import FreqPreservingUNet

    if not _FPU_ARTIFACT.exists():
        raise FileNotFoundError(f"bundled artifact missing: {_FPU_ARTIFACT}")
    return FreqPreservingUNet(base=32, quant=quant), load_quantized(_FPU_ARTIFACT)


def load_pretrained_fpu_reverb(quant: bool = False):
    """Returns (model, variables) for the reverb-robust FreqPreservingUNet
    (logmag+IPD features, trained on room-acoustics scenes)."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import FreqPreservingUNet

    if not _FPU_REVERB_ARTIFACT.exists():
        raise FileNotFoundError(
            f"bundled artifact missing: {_FPU_REVERB_ARTIFACT}"
        )
    return FreqPreservingUNet(base=32, quant=quant), load_quantized(_FPU_REVERB_ARTIFACT)


def load_pretrained_fpu_multigeo(quant: bool = False):
    """Returns (model, variables) for the mic-spacing-robust
    FreqPreservingUNet — the recommended model for real arrays whose
    geometry differs from the 4 cm training default."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import FreqPreservingUNet

    if not _FPU_MULTIGEO_ARTIFACT.exists():
        raise FileNotFoundError(
            f"bundled artifact missing: {_FPU_MULTIGEO_ARTIFACT}"
        )
    return FreqPreservingUNet(base=32, quant=quant), load_quantized(_FPU_MULTIGEO_ARTIFACT)


def load_pretrained_crn_causal():
    """Returns (model, variables) for the bundled causal CRN — the
    frame-latency streaming mask net (pairs with
    azoom.pipelines.online_learned)."""
    from azoom.models.crn import CRNMaskNet
    from azoom.models.quantize import load_quantized

    if not _CRN_CAUSAL_ARTIFACT.exists():
        raise FileNotFoundError(
            f"bundled artifact missing: {_CRN_CAUSAL_ARTIFACT}"
        )
    return (
        CRNMaskNet(base=16, hidden=128, unidirectional=True),
        load_quantized(_CRN_CAUSAL_ARTIFACT),
    )


def load_pretrained_deepfpu(quant: bool = False):
    """Returns (model, variables) for the bundled DeepFPU (physics-aware
    4-channel features), or raises FileNotFoundError."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import DeepFPU

    if not _DEEPFPU_ARTIFACT.exists():
        raise FileNotFoundError(f"bundled artifact missing: {_DEEPFPU_ARTIFACT}")
    return DeepFPU(base=32, quant=quant), load_quantized(_DEEPFPU_ARTIFACT)


def load_pretrained_tpufpu(quant: bool = False):
    """Returns (model, variables) for the bundled TPUFPU — the MXU-shaped
    flagship (physics features; 2.25x DeepFPU's speed at equal accuracy,
    see the artifact note above)."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import TPUFPU

    if not _TPUFPU_ARTIFACT.exists():
        raise FileNotFoundError(f"bundled artifact missing: {_TPUFPU_ARTIFACT}")
    return TPUFPU(base=64, fold=4, quant=quant), load_quantized(_TPUFPU_ARTIFACT)


def load_pretrained_tpufpu_slim(quant: bool = False):
    """Returns (model, variables) for the slim-bottleneck TPUFPU
    (bneck=4) — the serving-latency flagship: ~1.3x tpufpu's net speed
    at equal-or-better held-out quality (see the artifact note above)."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import TPUFPU

    if not _TPUFPU_SLIM_ARTIFACT.exists():
        raise FileNotFoundError(
            f"bundled artifact missing: {_TPUFPU_SLIM_ARTIFACT}"
        )
    return (
        TPUFPU(base=64, fold=4, quant=quant, bneck=4),
        load_quantized(_TPUFPU_SLIM_ARTIFACT),
    )


def load_pretrained_tpufpu_nano(quant: bool = False):
    """Returns (model, variables) for the nano TPUFPU (bneck=4,
    dec_div=2, enc_div=2), distilled from tpufpu_slim — the serving
    throughput flagship (see the artifact note above)."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import TPUFPU

    if not _TPUFPU_NANO_ARTIFACT.exists():
        raise FileNotFoundError(
            f"bundled artifact missing: {_TPUFPU_NANO_ARTIFACT}"
        )
    return (
        TPUFPU(base=64, fold=4, quant=quant, bneck=4, dec_div=2, enc_div=2),
        load_quantized(_TPUFPU_NANO_ARTIFACT),
    )


def load_bundled(name: str, quant: bool = False, fold_bn: bool = False):
    """One dispatcher for every bundled artifact (the single source of
    truth for model-name -> (loader, feature_kind); CLIs and the
    AudioZoom facade all route through here so a new model is added in
    one place).

    Returns (model, variables, feature_kind). ``quant`` serves the mask
    nets on the int8 MXU path where supported (ignored for the CRN).
    ``fold_bn`` absorbs every Conv->BatchNorm pair into the conv
    kernel/bias at load time — the TFLite-converter fold
    (azoom.models.quantize.fold_batchnorm). Default OFF: measured
    throughput-neutral on v5e (220.0 vs 224.2 us/apply — XLA already
    fuses inference-mode BN into the conv epilogue, so there is no
    latency to recover; RESULTS.md round 3), and on the int8 path the
    identity-BN rewrite perturbs activations by ~1 ulp which re-rounds a
    few activation codes (SIR unchanged: +24.48 vs +24.50 on the real
    fixture). Available for payload slimming or export to runtimes
    without an XLA-grade fuser.
    """
    table = {
        "fpu": (load_pretrained_fpu, "logmag_ipd", True),
        "fpu_reverb": (load_pretrained_fpu_reverb, "logmag_ipd", True),
        "fpu_multigeo": (load_pretrained_fpu_multigeo, "logmag_ipd", True),
        "deepfpu": (load_pretrained_deepfpu, "physics", True),
        "tpufpu": (load_pretrained_tpufpu, "physics", True),
        "tpufpu_slim": (load_pretrained_tpufpu_slim, "physics", True),
        "tpufpu_nano": (load_pretrained_tpufpu_nano, "physics", True),
        "crn_causal": (load_pretrained_crn_causal, "logmag_ipd", False),
    }
    if name not in table:
        raise KeyError(f"unknown bundled model {name!r}; have {sorted(table)}")
    loader, feature_kind, supports_quant = table[name]
    model, variables = (
        loader(quant=quant) if supports_quant else loader()
    )
    if fold_bn and supports_quant:  # conv nets only; the CRN has no BN
        from azoom.models.quantize import fold_batchnorm

        variables = fold_batchnorm(variables)
    return model, variables, feature_kind

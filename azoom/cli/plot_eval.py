"""Perceptual evaluation + spectrogram comparison plots.

Rebuild of scripts/plot_pesq.py:13-185 (the OO PESQEvaluator with
plot_spectograms): loads a reference and a degraded WAV, reports PESQ
(when the host lib exists) + STOI + projection SIR if stems are present,
and writes a side-by-side log-spectrogram comparison PNG.

Usage: python -m azoom.cli.plot_eval REF.wav DEG.wav [--out cmp.png]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def plot_spectrograms(
    ref: np.ndarray, deg: np.ndarray, fs: int, out_path: str | Path,
    titles=("Reference", "Degraded"),
) -> None:
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from azoom.dsp.stft import stft
    from azoom.utils.host import to_numpy

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5), sharey=True)
    for ax, sig, title in zip(axes, (ref, deg), titles):
        Z = to_numpy(stft(jnp.asarray(sig), 1024, 512))
        mag_db = 20 * np.log10(np.abs(Z) + 1e-8)
        extent = [0, len(sig) / fs, 0, fs / 2 / 1000]
        im = ax.imshow(
            mag_db, origin="lower", aspect="auto", extent=extent,
            vmin=mag_db.max() - 80, vmax=mag_db.max(), cmap="magma",
        )
        ax.set_title(title)
        ax.set_xlabel("time (s)")
    axes[0].set_ylabel("frequency (kHz)")
    fig.colorbar(im, ax=axes, label="dB")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(prog="azoom.plot_eval")
    p.add_argument("ref")
    p.add_argument("deg")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from azoom.eval.pesq_bridge import PESQ_AVAILABLE, pesq_scores
    from azoom.eval.stoi import stoi
    from azoom.io.wav import read_wav

    ref, fs = read_wav(args.ref)
    deg, fs2 = read_wav(args.deg)
    if ref.ndim > 1:
        ref = ref[:, 0]
    if deg.ndim > 1:
        deg = deg[:, 0]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    if fs != fs2:
        print(f"[PLOT_EVAL] WARNING: fs mismatch {fs} vs {fs2}")

    s = float(stoi(jnp.asarray(ref), jnp.asarray(deg), fs))
    print(f"STOI: {s:.4f}")
    if PESQ_AVAILABLE:
        nb, wb = pesq_scores(ref, deg, fs)
        print(f"PESQ: {wb} (WB) | {nb} (NB)")
    else:
        print("PESQ: library not available (optional)")

    out = args.out or (Path(args.deg).with_suffix("") .as_posix() + "_spectrograms.png")
    plot_spectrograms(ref, deg, fs, out)
    print(f"[PLOT_EVAL] spectrogram comparison saved to {out}")


if __name__ == "__main__":
    main()

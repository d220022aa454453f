"""SRP localization debugger: ``python -m azoom.cli.debug_srp DIR``.

Rebuild of scripts/debug_srp.py:25-100: scan 0-180 deg over the 200-4000 Hz
band on the run directory's mixture.wav, plot the normalized dB response
with markers at the expected source bearings, and print the peak.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="azoom.debug_srp")
    p.add_argument("run_dir", help="directory containing mixture.wav")
    p.add_argument("--mic-dist", type=float, default=0.08)
    p.add_argument("--true-angles", type=float, nargs="*", default=[40.0, 90.0, 130.0])
    p.add_argument("--phat", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from azoom.config import DEFAULT
    from azoom.dsp.stft import rfft_freqs, stft
    from azoom.io.wav import read_wav
    from azoom.localize.srp import srp_map

    run_dir = Path(args.run_dir)
    audio, fs = read_wav(run_dir / "mixture.wav")
    mixture = jnp.asarray(audio.T)
    cfg = DEFAULT
    Y = stft(mixture, cfg.n_fft, cfg.hop)
    freqs = rfft_freqs(cfg.n_fft, fs)
    angles, power = srp_map(Y, freqs, args.mic_dist, phat=args.phat)
    angles, power = np.asarray(angles), np.asarray(power)
    power_db = 10 * np.log10(power / power.max() + 1e-12)

    peak = float(angles[np.argmax(power)])
    print(f"[SRP] peak response at {peak:.1f} deg")

    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(angles, power_db)
    for a in args.true_angles:
        ax.axvline(a, color="r", ls="--", alpha=0.6)
    ax.set_xlabel("azimuth (deg)")
    ax.set_ylabel("SRP (dB rel max)")
    ax.set_title(f"SRP scan — peak {peak:.1f} deg")
    out = run_dir / "srp_scan.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"[SRP] plot saved to {out}")


if __name__ == "__main__":
    main()

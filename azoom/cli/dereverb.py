"""WPE dereverberation CLI: ``python -m azoom.cli.dereverb --outdir DIR``.

Rebuild of rt_av_zoom/core/dereverb.py:108-146: reads DIR/mixture.wav,
writes DIR/mixture_wpe.wav, with the same --taps/--delay/--iters flags.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(prog="azoom.dereverb")
    p.add_argument("--outdir", required=True)
    p.add_argument("--taps", type=int, default=10)
    p.add_argument("--delay", type=int, default=3)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from azoom.config import DEFAULT
    from azoom.io.wav import read_wav, write_wav
    from azoom.utils.host import to_numpy
    from azoom.wpe.dereverb import wpe_dereverb

    outdir = Path(args.outdir)
    audio, fs = read_wav(outdir / "mixture.wav")
    mixture = jnp.asarray(audio.T)  # (C, n)
    print(f"[WPE] Dereverberating {outdir / 'mixture.wav'} "
          f"(taps={args.taps} delay={args.delay} iters={args.iters})...")
    out = wpe_dereverb(mixture, DEFAULT, args.taps, args.delay, args.iters)
    out_path = outdir / "mixture_wpe.wav"
    write_wav(out_path, to_numpy(out).T, fs)
    print(f"[WPE] Saved {out_path}")


if __name__ == "__main__":
    main()

"""Assemble the AUGMENTED real-speech corpus (round-5, VERDICT r4 #7).

The round-4 real-speech-training negative was corpus-size-bound: 2
unique utterances / ~73 s. This builds the biggest real-ish corpus the
egress-less environment allows, from the same hygienic source family
(the "2src-scene" stems — the anechoic ``test_*`` eval trio shares no
utterance with any of it):

  * the 8 committed 2src-family WAVs (refs + sigma-study views),
  * rate/pitch variants via the anti-aliased polyphase resampler
    (played at r in {0.85 .. 1.18}: tempo AND pitch shift together —
    the classic speed-perturbation augmentation),
  * reverb renders through RANDOMIZED shoebox rooms via the on-device
    image-source model (dims 3.5-7 m, RT60 0.25-0.7 s, random source /
    mic placement): new acoustic channels over the same utterances.

Output: data/real_corpus_aug/ (gitignored), ~11x the round-4 corpus by
duration. scripts/train_nano_real.py --aug consumes it.

Run: timeout 900 python scripts/build_real_corpus_aug.py
"""
import shutil
import sys
from fractions import Fraction
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

import azoom  # noqa: F401
import jax.numpy as jnp
from azoom.dsp.resample import resample_poly
from azoom.io.wav import read_wav, write_wav
from azoom.sim.room import fft_convolve, inverse_sabine, shoebox_rir
from azoom.utils.host import to_numpy

REF = Path("/root/reference/data")
OUT = Path("/root/repo/data/real_corpus_aug")

SRC_FILES = [
    REF / "inputs" / "target_reference_2.wav",
    REF / "inputs" / "interference_reference_2.wav",
    REF / "outputs" / "output_2src_sigma_0.0e+00.wav",
    REF / "outputs" / "output_2src_sigma_0.0e+00_tst60.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-05.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-06.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-08.wav",
    REF / "outputs" / "output_2src_sigma_1.0e-09.wav",
]
RATES = [0.85, 0.9, 0.95, 1.05, 1.1, 1.18]
ROOMS_PER_FILE = 4
FS = 16_000


def mono(path: Path) -> np.ndarray:
    audio, fs = read_wav(path)
    assert fs == FS, (path, fs)
    if audio.ndim == 2:  # (samples, channels) -> mono
        audio = audio.mean(axis=1)
    x = audio.astype(np.float32)
    peak = np.max(np.abs(x)) + 1e-9
    return x / peak * 0.5


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(5)
    total_s = 0.0
    n_files = 0
    for f in SRC_FILES:
        x = mono(f)
        stem = f.stem
        write_wav(OUT / f"{stem}.wav", x, FS)
        total_s += x.size / FS
        n_files += 1
        # --- speed perturbation (resample_poly is anti-aliased) ---
        for r in RATES:
            fr = Fraction(r).limit_denominator(50)
            y = to_numpy(resample_poly(
                jnp.asarray(x), fr.denominator, fr.numerator))
            write_wav(OUT / f"{stem}_rate{r:.2f}.wav", y, FS)
            total_s += y.size / FS
            n_files += 1
        # --- randomized-room reverb renders ---
        for k in range(ROOMS_PER_FILE):
            dims = rng.uniform(3.5, 7.0, size=3)
            dims[2] = rng.uniform(2.4, 3.2)
            rt60 = float(rng.uniform(0.25, 0.7))
            absorption = float(inverse_sabine(rt60, dims))
            src = rng.uniform(0.5, 1.0, size=3) * (dims - 1.0) + 0.5
            mic = rng.uniform(0.0, 1.0, size=3) * (dims - 1.0) + 0.5
            rir = shoebox_rir(src, mic, dims, absorption, max_order=12,
                              fs=FS)
            y = to_numpy(fft_convolve(jnp.asarray(x), rir, x.size))
            peak = np.max(np.abs(y)) + 1e-9
            write_wav(OUT / f"{stem}_room{k}.wav", y / peak * 0.5, FS)
            total_s += y.size / FS
            n_files += 1
        print(f"[AUG] {stem}: original + {len(RATES)} rates + "
              f"{ROOMS_PER_FILE} rooms", flush=True)
    print(f"[AUG] corpus: {n_files} files, {total_s:.0f} s "
          f"({total_s / 73.0:.1f}x the round-4 corpus)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--clean":
        shutil.rmtree(OUT, ignore_errors=True)
    main()

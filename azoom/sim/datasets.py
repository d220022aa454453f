"""Corpus providers: hermetic local-directory datasets with caching.

The reference pulls LJSpeech / LibriSpeech / MUSAN at runtime through
kagglehub (world.py:38-67, simulation.py:12-44) — a network dependency that
SURVEY.md §7 flags for replacement. Here the provider contract is: scan a
local directory tree for WAVs once (cached), hand out random crops at the
pipeline sample rate, and fall back to synthesized speech-like utterances
when no corpus is present so every pipeline stays runnable hermetically.

Environment variable ``AZOOM_DATA_DIR`` (or the ``root`` argument) points
at the corpus root; nesting is arbitrary (LJSpeech-1.1/wavs, LibriSpeech
chapter dirs, ... all work — it is just a recursive glob).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import numpy as np

from azoom.io.wav import read_wav

__all__ = ["LocalCorpus", "get_sources"]


class LocalCorpus:
    """Random-crop sampler over a directory tree of WAV files."""

    def __init__(self, root: str | os.PathLike, fs: int = 16_000):
        self.root = Path(root)
        self.fs = fs
        self.files = sorted(self.root.rglob("*.wav")) if self.root.is_dir() else []

    def __len__(self) -> int:
        return len(self.files)

    @functools.lru_cache(maxsize=256)
    def _load(self, path: str) -> np.ndarray:
        audio, fs = read_wav(path)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        if fs != self.fs:
            import jax.numpy as jnp

            from azoom.dsp.resample import resample_fft

            n_out = int(len(audio) * self.fs / fs)
            audio = np.asarray(resample_fft(jnp.asarray(audio), n_out))
        return audio.astype(np.float32)

    def sample(self, rng: np.random.Generator, n_samples: int) -> np.ndarray:
        """One random crop (n_samples,), looped/padded if the file is short
        (world.py's min-length truncation inverted: we never shrink the
        requested crop)."""
        if not self.files:
            raise FileNotFoundError(f"no wavs under {self.root}")
        path = self.files[int(rng.integers(len(self.files)))]
        audio = self._load(str(path))
        if len(audio) < n_samples:
            reps = -(-n_samples // max(len(audio), 1))
            audio = np.tile(audio, reps)
        start = int(rng.integers(0, len(audio) - n_samples + 1))
        return audio[start : start + n_samples]

    def sample_batch(
        self, rng: np.random.Generator, n_signals: int, n_samples: int
    ) -> np.ndarray:
        return np.stack([self.sample(rng, n_samples) for _ in range(n_signals)])


def get_sources(
    n_signals: int,
    n_samples: int,
    fs: int = 16_000,
    root: str | os.PathLike | None = None,
    seed: int = 0,
):
    """(n_signals, n_samples) float32 sources — real corpus when available,
    synthesized speech-like otherwise (the hermetic default)."""
    root = root or os.environ.get("AZOOM_DATA_DIR")
    if root:
        corpus = LocalCorpus(root, fs)
        if len(corpus):
            return corpus.sample_batch(
                np.random.default_rng(seed), n_signals, n_samples
            )
    import jax

    from azoom.sim.signals import speech_like_batch

    return np.asarray(
        speech_like_batch(jax.random.PRNGKey(seed), n_signals, n_samples, fs)
    )

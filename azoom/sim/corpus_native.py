"""ctypes binding for the native corpus prefetch engine.

The reference overlaps dataset synthesis with training through torch
DataLoader worker *processes* (model_training.py:155 ``num_workers=2``)
and a keras Sequence (model_neural.py:25-94). azoom's equivalent is a
C++ background thread (cpp/corpus_engine.cpp): it scans the corpus tree,
decodes WAVs (PCM16/32 + float32, mono downmix, linear resample), and
keeps a bounded ring of pre-cropped source batches filled ahead of the
trainer — ``next_batch()`` is a memcpy, so host IO rides under device
compute instead of serializing with it.

Auto-builds ``cpp/build/libcorpus.so`` on first use; degrades gracefully
(``native_available()``) to the Python LocalCorpus when no toolchain is
present. Crop sampling is deterministic given (seed, file set).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "NativeCorpus"]

_CPP_DIR = Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "build" / "libcorpus.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_CPP_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    f1 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.azoom_corpus_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.azoom_corpus_open.restype = ctypes.c_void_p
    lib.azoom_corpus_n_files.argtypes = [ctypes.c_void_p]
    lib.azoom_corpus_n_files.restype = ctypes.c_int
    lib.azoom_corpus_n_dropped.argtypes = [ctypes.c_void_p]
    lib.azoom_corpus_n_dropped.restype = ctypes.c_int
    lib.azoom_corpus_next.argtypes = [ctypes.c_void_p, f1]
    lib.azoom_corpus_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeCorpus:
    """Prefetching random-crop sampler over a directory tree of WAVs.

    Same corpus contract as datasets.LocalCorpus, but batches of
    ``n_signals`` crops are produced by the C++ worker thread ahead of
    demand (``depth`` slots deep). The sampling stream is owned by the
    engine (seeded at open), so ``next_batch()`` takes no rng.
    """

    def __init__(self, root, fs: int = 16_000, *, n_signals: int,
                 n_samples: int, seed: int = 0, depth: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native corpus engine unavailable "
                               "(no C++ toolchain); use LocalCorpus")
        self._lib = lib
        self.n_signals, self.n_samples = n_signals, n_samples
        self._h = lib.azoom_corpus_open(
            str(root).encode(), fs, seed & 0xFFFFFFFFFFFFFFFF,
            n_signals, n_samples, depth,
        )
        if not self._h:
            raise FileNotFoundError(f"no decodable wavs under {root}")
        dropped = self.n_dropped
        if dropped:
            print(f"[CORPUS] native loader dropped {dropped} undecodable "
                  f"wav(s) under {root} ({len(self)} usable)")

    def __len__(self) -> int:
        return int(self._lib.azoom_corpus_n_files(self._h))

    @property
    def n_dropped(self) -> int:
        """Files found but rejected by the open-time decode probe."""
        return int(self._lib.azoom_corpus_n_dropped(self._h))

    def next_batch(self) -> np.ndarray:
        """(n_signals, n_samples) float32 — blocks only if the prefetch
        ring is empty (cold start)."""
        out = np.empty(self.n_signals * self.n_samples, np.float32)
        self._lib.azoom_corpus_next(self._h, out)
        return out.reshape(self.n_signals, self.n_samples)

    def close(self) -> None:
        if self._h:
            self._lib.azoom_corpus_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort; explicit close() preferred
        try:
            self.close()
        except Exception:
            pass

"""ctypes binding for the native (C++) push-based streaming engine.

The runtime layer between an audio callback and the device-side
enhancement graph: `cpp/stream_engine.cpp` owns the ring buffer, window
extraction, and Hann 50 % overlap-add, so ``AudioZoom.push`` does no
per-block NumPy reallocation (the reference rebuilds Python lists per
chunk, Final_pipeline/src/inference.py:171-233). Auto-builds
``cpp/build/libstream.so`` with the repo Makefile on first use; callers
gate on :func:`native_available` and fall back to the pure-NumPy path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "NativeStream"]

_CPP_DIR = Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "build" / "libstream.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB_PATH.exists():
        try:
            # Build only our own target: the default target also builds
            # librir.so with -fopenmp, and a toolchain without OpenMP must
            # not disable the (OpenMP-free) stream engine.
            subprocess.run(
                ["make", "-C", str(_CPP_DIR), "build/libstream.so"],
                check=True, capture_output=True, timeout=120,
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
    lib.azoom_stream_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.azoom_stream_create.restype = ctypes.c_void_p
    lib.azoom_stream_destroy.argtypes = [ctypes.c_void_p]
    lib.azoom_stream_reset.argtypes = [ctypes.c_void_p]
    lib.azoom_stream_push.argtypes = [ctypes.c_void_p, f1, ctypes.c_int]
    lib.azoom_stream_push.restype = ctypes.c_int
    lib.azoom_stream_windows_ready.argtypes = [ctypes.c_void_p]
    lib.azoom_stream_windows_ready.restype = ctypes.c_int
    lib.azoom_stream_next_window.argtypes = [ctypes.c_void_p, f1]
    lib.azoom_stream_next_window.restype = ctypes.c_int
    lib.azoom_stream_commit.argtypes = [ctypes.c_void_p, f1, f1]
    lib.azoom_stream_commit.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeStream:
    """Push-based stream buffer with native window extraction and OLA.

    Usage (one enhanced hop per analysis window)::

        s = NativeStream(n_mics=2, win=32_000)
        s.push(block)                      # any (M, k), k >= 0
        for window in s.windows():         # (M, win) views, hop apart
            finalized = s.commit(enhance(window))   # (hop,) or (0,)
    """

    def __init__(self, n_mics: int, win: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native stream engine unavailable (build failed)")
        self._lib = lib
        self.n_mics, self.win, self.hop = n_mics, win, win // 2
        self._h = lib.azoom_stream_create(n_mics, win, self.hop)
        if not self._h:
            raise ValueError(f"bad stream geometry ({n_mics=}, {win=})")
        self._wbuf = np.empty((n_mics, win), np.float32)
        self._obuf = np.empty(self.hop, np.float32)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.azoom_stream_destroy(h)
            self._h = None

    def reset(self) -> None:
        self._lib.azoom_stream_reset(self._h)

    def push(self, samples) -> None:
        samples = np.ascontiguousarray(samples, np.float32)
        if samples.ndim != 2 or samples.shape[0] != self.n_mics:
            raise ValueError(f"expected ({self.n_mics}, k), got {samples.shape}")
        if samples.shape[1] == 0:
            return
        rc = self._lib.azoom_stream_push(self._h, samples, samples.shape[1])
        if rc != 0:
            raise RuntimeError(f"native stream push error {rc}")

    def windows_ready(self) -> int:
        return self._lib.azoom_stream_windows_ready(self._h)

    def windows(self):
        """Yield each ready (M, win) analysis window (a reused buffer —
        consume or copy before the next iteration). Windows are PEEKED:
        each yielded window MUST be answered with :meth:`commit` to
        advance the stream (the transactional contract — an enhancement
        failure between peek and commit loses no audio); skipping commit
        would re-yield the same window forever."""
        while self._lib.azoom_stream_next_window(self._h, self._wbuf):
            yield self._wbuf

    def commit(self, enhanced) -> np.ndarray:
        """Consume the last peeked window and OLA its enhancement;
        returns finalized samples ((hop,) once the stream is warm, (0,)
        for the first window)."""
        enhanced = np.ascontiguousarray(enhanced, np.float32)
        if enhanced.shape != (self.win,):
            raise ValueError(f"expected ({self.win},), got {enhanced.shape}")
        n = self._lib.azoom_stream_commit(self._h, enhanced, self._obuf)
        if n < 0:
            raise RuntimeError("commit with no pending window")
        return self._obuf[:n].copy()

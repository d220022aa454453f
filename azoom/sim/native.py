"""ctypes binding for the native (C++/OpenMP) image-source RIR engine.

Host-side twin of azoom.sim.room's JAX ISM (same Allen-Berkley math, same
windowed-sinc injection) for CPU-bound dataset factories — the azoom
equivalent of the pyroomacoustics C++ core the reference leans on
(simulation.py:105-144). Auto-builds ``cpp/build/librir.so`` with the
repo Makefile on first use; every entry point degrades gracefully to the
JAX implementation when no toolchain is available
(``native_available()`` gates it).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["native_available", "shoebox_rir_native", "rir_matrix_native"]

_CPP_DIR = Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "build" / "librir.so"
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

    d3 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f1 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.azoom_shoebox_rir.argtypes = [
        d3, d3, d3, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, f1, ctypes.c_int,
    ]
    lib.azoom_shoebox_rir.restype = ctypes.c_int
    lib.azoom_rir_matrix.argtypes = [
        d3, ctypes.c_int, d3, ctypes.c_int, d3, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        f1, ctypes.c_int,
    ]
    lib.azoom_rir_matrix.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def shoebox_rir_native(
    source, mic, room_dim, absorption: float, max_order: int = 15,
    fs: int = 16_000, rir_length: int = 8_000, n_taps: int = 16,
    c: float = 343.0,
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native RIR engine unavailable (build failed)")
    out = np.zeros(rir_length, np.float32)
    rc = lib.azoom_shoebox_rir(
        np.ascontiguousarray(source, np.float64),
        np.ascontiguousarray(mic, np.float64),
        np.ascontiguousarray(room_dim, np.float64),
        float(absorption), int(max_order), int(fs), float(c), int(n_taps),
        out, int(rir_length),
    )
    if rc != 0:
        raise RuntimeError(f"native RIR engine error {rc}")
    return out


def rir_matrix_native(
    sources, mics, room_dim, absorption: float, max_order: int = 15,
    fs: int = 16_000, rir_length: int = 8_000, n_taps: int = 16,
    c: float = 343.0,
) -> np.ndarray:
    """(S, M, rir_length) RIR table, computed natively on host threads."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native RIR engine unavailable (build failed)")
    sources = np.ascontiguousarray(np.atleast_2d(sources), np.float64)
    mics = np.ascontiguousarray(np.atleast_2d(mics), np.float64)
    S, M = len(sources), len(mics)
    out = np.zeros((S, M, rir_length), np.float32)
    rc = lib.azoom_rir_matrix(
        sources, S, mics, M,
        np.ascontiguousarray(room_dim, np.float64),
        float(absorption), int(max_order), int(fs), float(c), int(n_taps),
        out.reshape(-1), int(rir_length),
    )
    if rc != 0:
        raise RuntimeError(f"native RIR engine error {rc}")
    return out

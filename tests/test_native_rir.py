"""Native C++ RIR engine vs. the JAX image-source model (identical math)."""

import numpy as np
import pytest

from azoom.sim.native import native_available, rir_matrix_native, shoebox_rir_native
from azoom.sim.room import inverse_sabine, rir_matrix, shoebox_rir

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain"
)

ROOM = (4.9, 4.9, 4.9)
SRC = np.array([2.45, 3.45, 1.5])
MIC = np.array([2.41, 2.45, 1.5])
FS = 16_000


def test_native_matches_jax_anechoic():
    r_cpp = shoebox_rir_native(SRC, MIC, ROOM, 1.0, 0, FS, 2048)
    r_jax = np.asarray(shoebox_rir(SRC, MIC, ROOM, 1.0, 0, FS, 2048))
    np.testing.assert_allclose(r_cpp, r_jax, atol=1e-5)


def test_native_matches_jax_reverb():
    a = inverse_sabine(0.5, ROOM)
    r_cpp = shoebox_rir_native(SRC, MIC, ROOM, a, 5, FS, 6000)
    r_jax = np.asarray(shoebox_rir(SRC, MIC, ROOM, a, 5, FS, 6000))
    np.testing.assert_allclose(r_cpp, r_jax, atol=1e-4, rtol=1e-3)


def test_native_rir_matrix():
    sources = np.array([[2.45, 3.45, 1.5], [3.22, 3.06, 1.5]])
    mics = np.array([[2.41, 2.45, 1.5], [2.49, 2.45, 1.5]])
    a = inverse_sabine(0.5, ROOM)
    R_cpp = rir_matrix_native(sources, mics, ROOM, a, 4, FS, 4000)
    R_jax = np.asarray(rir_matrix(sources, mics, ROOM, a, 4, FS, 4000))
    assert R_cpp.shape == R_jax.shape == (2, 2, 4000)
    np.testing.assert_allclose(R_cpp, R_jax, atol=1e-4, rtol=1e-3)

"""STFT/iSTFT parity with scipy.signal — the transform every reference
pipeline stage depends on (SURVEY.md section 4 item 5: round-trip fidelity)."""

import numpy as np
import pytest
import scipy.signal

from azoom.dsp import istft, rfft_freqs, stft, stft_frame_count

FS = 16000


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (1024, 512)])
@pytest.mark.parametrize("n", [32000, 16001, 5000])
def test_stft_matches_scipy(rng, n_fft, hop, n):
    x = rng.standard_normal(n).astype(np.float32)
    _, _, Z_ref = scipy.signal.stft(x, fs=FS, nperseg=n_fft, noverlap=n_fft - hop)
    Z = np.asarray(stft(x, n_fft=n_fft, hop=hop))
    assert Z.shape == Z_ref.shape
    assert stft_frame_count(n, n_fft, hop) == Z_ref.shape[-1]
    np.testing.assert_allclose(Z, Z_ref, atol=1e-6)


def test_stft_multichannel_matches_scipy(rng):
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    _, _, Z_ref = scipy.signal.stft(x, fs=FS, nperseg=1024, noverlap=512)
    Z = np.asarray(stft(x, n_fft=1024, hop=512))
    assert Z.shape == Z_ref.shape == (2, 513, Z_ref.shape[-1])
    np.testing.assert_allclose(Z, Z_ref, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (1024, 512)])
def test_istft_matches_scipy(rng, n_fft, hop):
    x = rng.standard_normal(24000).astype(np.float32)
    _, _, Z = scipy.signal.stft(x, fs=FS, nperseg=n_fft, noverlap=n_fft - hop)
    # Perturb the spectrogram so we test general inversion, not just identity.
    Z = Z * (1.0 + 0.1 * rng.standard_normal(Z.shape))
    _, x_ref = scipy.signal.istft(Z, fs=FS, nperseg=n_fft, noverlap=n_fft - hop)
    x_ours = np.asarray(istft(Z.astype(np.complex64), n_fft=n_fft, hop=hop))
    assert x_ours.shape == x_ref.shape
    np.testing.assert_allclose(x_ours, x_ref, atol=1e-5)


def test_round_trip_reconstruction(rng):
    """STFT -> iSTFT round-trip MSE check (reference notebook cell 5's
    stft_reconstruct_mse)."""
    x = rng.standard_normal(32000).astype(np.float32)
    y = np.asarray(istft(stft(x), length=len(x)))
    mse = np.mean((x - y) ** 2) / np.mean(x**2)
    assert mse < 1e-10


def test_rfft_freqs():
    f = np.asarray(rfft_freqs(1024, FS))
    np.testing.assert_allclose(f, np.fft.rfftfreq(1024, 1 / FS))


def test_config_frames_per_chunk_matches_stft():
    from azoom.config import DEFAULT, GEN1

    for cfg in (DEFAULT, GEN1):
        assert cfg.frames_per_chunk == stft_frame_count(
            cfg.win_size, cfg.n_fft, cfg.hop
        )


def test_matmul_dft_matches_fft_path(monkeypatch):
    """The TPU matmul-DFT forward path (window + scaling folded into the
    DFT matrices) must match the pocketfft path to float32 round-off, for
    every shape class the pipelines use."""
    import importlib

    import jax.numpy as jnp

    # azoom.dsp re-exports the stft *function*, which shadows the
    # submodule on attribute lookup — resolve the module explicitly.
    S = importlib.import_module("azoom.dsp.stft")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 2, 9_000)), jnp.float32)
    ref = S.stft(x, 1024, 512)  # fft path (CPU backend)
    monkeypatch.setattr(S, "_use_matmul_dft", lambda n_fft: True)
    # Bypass the jitted wrapper: its trace cache would otherwise ignore
    # the patched gate and trivially return the fft-path program.
    got = S.stft.__wrapped__(x, 1024, 512)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 1e-5, err
    # Inverse matmul path: must match the irfft-based iSTFT and close the
    # round trip back to the input.
    y_ref = S.istft(ref, 1024, 512, length=9_000)
    y_mm = S.istft.__wrapped__(got, 1024, 512, length=9_000)
    assert float(jnp.max(jnp.abs(y_mm - y_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(y_mm - x))) < 1e-4

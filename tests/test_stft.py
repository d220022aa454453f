"""STFT/iSTFT parity with scipy.signal — the transform every reference
pipeline stage depends on (SURVEY.md section 4 item 5: round-trip fidelity)."""

import numpy as np
import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow
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


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (1024, 512)])
def test_matmul_dft_matches_fft_path(monkeypatch, n_fft, hop):
    """The TPU matmul-DFT forward/inverse paths (window + scaling folded
    into the DFT matrices) must match the pocketfft paths to float32
    round-off, for both pipeline STFT configurations. Both reference and
    matmul computations pin their gate explicitly (so the comparison is
    fft-vs-matmul on every backend) and bypass the jitted wrappers
    (whose trace caches would ignore the patched gate)."""
    import importlib

    import jax.numpy as jnp

    # azoom.dsp re-exports the stft *function*, which shadows the
    # submodule on attribute lookup — resolve the module explicitly.
    S = importlib.import_module("azoom.dsp.stft")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 2, 9_000)), jnp.float32)
    monkeypatch.setattr(S, "_use_matmul_dft", lambda n: False)
    ref = S.stft.__wrapped__(x, n_fft, hop)
    y_ref = S.istft.__wrapped__(ref, n_fft, hop, length=9_000)
    monkeypatch.setattr(S, "_use_matmul_dft", lambda n: True)
    got = S.stft.__wrapped__(x, n_fft, hop)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 1e-5, err
    y_mm = S.istft.__wrapped__(got, n_fft, hop, length=9_000)
    assert float(jnp.max(jnp.abs(y_mm - y_ref))) < 1e-4
    assert float(jnp.max(jnp.abs(y_mm - x))) < 1e-4


@pytest.mark.parametrize("n_fft", [16, 17, 512, 513])
def test_idft_matrix_matches_irfft_any_parity(n_fft):
    """The inverse-DFT matrices must reproduce irfft for even AND odd
    n_fft (odd sizes have no Nyquist bin, so the Hermitian weight of the
    top bin differs — a round-2 review finding)."""
    import importlib

    import jax.numpy as jnp

    S = importlib.import_module("azoom.dsp.stft")
    rng = np.random.default_rng(1)
    F = n_fft // 2 + 1
    Z = jnp.asarray(
        rng.standard_normal((5, F)) + 1j * rng.standard_normal((5, F)),
        jnp.complex64,
    )
    win = np.asarray(S.hann(n_fft))
    ref = np.fft.irfft(np.asarray(Z), n=n_fft, axis=-1) * win * win.sum()
    A, B = S._idft_windowed(n_fft)
    got = np.asarray(Z.real) @ A - np.asarray(Z.imag) @ B
    np.testing.assert_allclose(got, ref, atol=1e-4 * max(1.0, np.abs(ref).max()))


def test_dsp_precision_knob_plumbs():
    """stft/istft accept precision='fast' (single-pass bf16 matmul-DFT on
    TPU — the benchmarked serving configuration). On the CPU test backend
    the matmul-DFT path is inactive, so both precisions must be bitwise
    identical; the quality A/B on real hardware lives in
    scripts/profile_dsp_precision.py (zero blind-SIR cost measured).
    Unknown precision names must fail loudly, not silently run exact."""
    import jax.numpy as jnp
    import pytest

    from azoom.dsp.stft import istft, stft

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8_000)), jnp.float32)
    Z_exact = stft(x, 512, 256)
    Z_fast = stft(x, 512, 256, precision="fast")
    np.testing.assert_array_equal(np.asarray(Z_exact), np.asarray(Z_fast))
    y_exact = istft(Z_exact, 512, 256, length=8_000)
    y_fast = istft(Z_exact, 512, 256, length=8_000, precision="fast")
    np.testing.assert_array_equal(np.asarray(y_exact), np.asarray(y_fast))
    with pytest.raises(ValueError):
        stft(x, 512, 256, precision="typo")


def test_learned_enhance_dsp_precision_dispatch(rng):
    """dsp_precision threads through the serving pipeline (and the sweep /
    autosteer / facade wrappers share the same parameter)."""
    import jax
    import jax.numpy as jnp

    from azoom.config import PipelineConfig
    from azoom.models.unet import FreqPreservingUNet
    from azoom.pipelines.learned import learned_enhance
    from azoom.train.data import synth_batch
    from azoom.train.loop import create_state

    cfg = PipelineConfig(mic_dist=0.04)
    model = FreqPreservingUNet(base=4)
    batch = synth_batch(jax.random.PRNGKey(0), 1, cfg, n_samples=8_192)
    state = create_state(model, jax.random.PRNGKey(0),
                         batch["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mix = jnp.asarray(rng.standard_normal((2, 16_000)) * 0.1, jnp.float32)
    out_e = learned_enhance(mix, model, variables, cfg)
    out_f = learned_enhance(mix, model, variables, cfg,
                            dsp_precision="fast")
    np.testing.assert_array_equal(np.asarray(out_e), np.asarray(out_f))

"""Native corpus prefetch engine (cpp/corpus_engine.cpp): decode parity
vs the Python WAV reader, crop contract, determinism, prefetch overlap,
and the fit(native_loader=True) end-to-end path."""

import struct
import time
import wave

import numpy as np
import pytest

from azoom.sim.corpus_native import NativeCorpus, native_available

# Round-4 suite tiering: SLOW tier (see README 'Testing').
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not native_available(), reason="no C++ toolchain"),
]


def _write_wav(path, audio, fs=16_000, fmt="pcm16", channels=1):
    audio = np.asarray(audio, np.float32)
    if channels > 1:
        audio = np.stack([audio] * channels, axis=1)
    if fmt == "pcm16":
        with wave.open(str(path), "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(fs)
            w.writeframes(
                (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
            )
    else:  # float32 RIFF written by hand (wave module can't)
        data = audio.astype("<f4").tobytes()
        n_ch = channels
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, n_ch, fs,
                                     fs * 4 * n_ch, 4 * n_ch, 32)
        hdr += b"data" + struct.pack("<I", len(data))
        path.write_bytes(hdr + data)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_corpus")
    rng = np.random.default_rng(0)
    t = np.arange(8_000) / 16_000
    _write_wav(d / "a.wav", 0.5 * np.sin(2 * np.pi * 440 * t))
    _write_wav(d / "b.wav", 0.25 * rng.standard_normal(4_000), fmt="f32")
    (d / "sub").mkdir()
    _write_wav(d / "sub" / "c.wav", 0.1 * rng.standard_normal(2_000),
               channels=2)
    _write_wav(d / "sub" / "d_8k.wav", 0.2 * rng.standard_normal(4_000),
               fs=8_000)
    return d


def test_scan_and_shape(corpus_dir):
    with NativeCorpus(corpus_dir, n_signals=6, n_samples=1_000, seed=7) as c:
        assert len(c) == 4  # recursive scan found the nested files
        b = c.next_batch()
        assert b.shape == (6, 1_000) and b.dtype == np.float32
        assert np.all(np.isfinite(b))
        assert float(np.max(np.abs(b))) > 0.0  # real audio, not silence


def test_decode_parity_with_python_reader(tmp_path):
    """Every crop the engine hands out must be a contiguous slice (or
    loop-pad) of a corpus file exactly as the Python reader decodes it —
    16 kHz corpus only, so no resampling ambiguity."""
    from azoom.io.wav import read_wav

    rng = np.random.default_rng(5)
    t = np.arange(8_000) / 16_000
    _write_wav(tmp_path / "a.wav", 0.5 * np.sin(2 * np.pi * 440 * t))
    _write_wav(tmp_path / "b.wav", 0.25 * rng.standard_normal(4_000),
               fmt="f32")
    _write_wav(tmp_path / "c.wav", 0.1 * rng.standard_normal(2_000),
               channels=2)
    _write_wav(tmp_path / "short.wav", 0.3 * rng.standard_normal(300))

    files = []
    for p in sorted(tmp_path.rglob("*.wav")):
        audio, fs = read_wav(p)
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        assert fs == 16_000
        files.append(audio.astype(np.float32))

    n = 500
    with NativeCorpus(tmp_path, n_signals=8, n_samples=n, seed=3) as c:
        batch = c.next_batch()
    for crop in batch:
        found = False
        for audio in files:
            if len(audio) >= n:
                # search for the crop as a slice (tolerance: int16 codec)
                w = np.lib.stride_tricks.sliding_window_view(audio, n)
                found = bool(np.any(np.all(np.abs(w - crop) < 2e-4, axis=1)))
            else:
                # loop-pad draws a random start phase (LocalCorpus.sample
                # semantics): accept any rotation of the tiled file
                L = len(audio)
                for start in range(L):
                    rolled = np.tile(np.roll(audio, -start), -(-n // L))[:n]
                    if float(np.max(np.abs(rolled - crop))) < 2e-4:
                        found = True
                        break
            if found:
                break
        assert found  # every crop provably comes from a real file


def _write_wav24(path, audio, fs=16_000):
    """Hand-rolled PCM24 RIFF (wave module in some versions can't)."""
    import struct

    x = (np.clip(np.asarray(audio, np.float64), -1, 1) * 8388607).astype(
        np.int64
    )
    data = b"".join(
        struct.pack("<i", int(v) << 8)[1:4] for v in x
    )
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(data))
    path.write_bytes(hdr + data)


def test_undecodable_files_dropped_not_silenced(tmp_path):
    """Garbage / unsupported WAVs must be dropped at open (with a count),
    never silently replaced by silence crops (ADVICE r3, medium)."""
    t = np.arange(4_000) / 16_000
    _write_wav(tmp_path / "good.wav", 0.5 * np.sin(2 * np.pi * 300 * t))
    (tmp_path / "garbage.wav").write_bytes(b"not a riff file at all")
    # truncated: valid header, data chunk declares bytes the file lacks
    import struct

    hdr = b"RIFF" + struct.pack("<I", 36 + 64_000) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16_000, 32_000, 2, 16)
    hdr += b"data" + struct.pack("<I", 64_000)
    (tmp_path / "truncated.wav").write_bytes(hdr)  # zero actual data bytes
    with NativeCorpus(tmp_path, n_signals=4, n_samples=1_000, seed=2) as c:
        assert len(c) == 1
        assert c.n_dropped == 2
        b = c.next_batch()
        # every crop comes from the good file — no silence rows
        assert float(np.min(np.max(np.abs(b), axis=1))) > 0.01


def test_pcm24_decode_parity(tmp_path):
    """PCM24 decodes to the same samples as the Python reader path."""
    rng = np.random.default_rng(9)
    audio = np.clip(0.4 * rng.standard_normal(3_000), -1, 1).astype(
        np.float32
    )
    _write_wav24(tmp_path / "x24.wav", audio)
    with NativeCorpus(tmp_path, n_signals=2, n_samples=2_000, seed=1) as c:
        assert len(c) == 1 and c.n_dropped == 0
        crop = c.next_batch()[0]
    w = np.lib.stride_tricks.sliding_window_view(audio, 2_000)
    assert bool(np.any(np.all(np.abs(w - crop) < 2e-6, axis=1)))


def test_resample_antialiased(tmp_path):
    """A 48 kHz corpus file holding a 20 kHz tone (above the 8 kHz output
    Nyquist) must come out strongly attenuated, not aliased into band
    (ADVICE r3: linear interpolation aliased here)."""
    t = np.arange(48_000) / 48_000
    _write_wav(tmp_path / "hi.wav", 0.5 * np.sin(2 * np.pi * 20_000 * t),
               fs=48_000)
    with NativeCorpus(tmp_path, n_signals=1, n_samples=8_000, seed=4) as c:
        crop = c.next_batch()[0]
    # aliased linear resample leaves ~0.1+ rms; windowed-sinc kills it
    assert float(np.sqrt(np.mean(crop**2))) < 0.02


def test_deterministic_stream(corpus_dir):
    with NativeCorpus(corpus_dir, n_signals=3, n_samples=800, seed=11) as a:
        b1 = [a.next_batch() for _ in range(3)]
    with NativeCorpus(corpus_dir, n_signals=3, n_samples=800, seed=11) as b:
        b2 = [b.next_batch() for _ in range(3)]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    with NativeCorpus(corpus_dir, n_signals=3, n_samples=800, seed=12) as c:
        assert not np.array_equal(c.next_batch(), b1[0])


def test_prefetch_overlaps(corpus_dir):
    """After a warm-up pause the ring is filled: next_batch must return
    much faster than cold decode."""
    with NativeCorpus(corpus_dir, n_signals=4, n_samples=2_000, seed=1,
                      depth=3) as c:
        c.next_batch()
        time.sleep(0.3)  # let the worker fill the ring
        t0 = time.perf_counter()
        c.next_batch()
        assert time.perf_counter() - t0 < 0.05


def test_fit_native_loader(corpus_dir, tmp_path):
    """fit(native_loader=True) trains end to end on the native stream."""
    from azoom.config import PipelineConfig
    from azoom.models.unet import FreqPreservingUNet
    from azoom.train.loop import fit

    r = fit(
        FreqPreservingUNet(base=2), PipelineConfig(mic_dist=0.04),
        n_steps=2, batch_size=1, n_samples=8_192,
        corpus_root=corpus_dir, native_loader=True,
        log_fn=lambda s: None,
    )
    assert r.steps_run == 2
    assert np.isfinite(r.losses[-1][1])

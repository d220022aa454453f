"""Native C++ streaming engine (cpp/stream_engine.cpp).

Validation: exact parity with the pure-NumPy OLA path in AudioZoom.push
across arbitrary (adversarial) block sizes, unit-gain reconstruction on a
passthrough enhancer, reset semantics, and geometry error handling. The
enhancement stub is deterministic so the comparison isolates the buffer /
window / OLA math.
"""

import numpy as np
import pytest

from azoom.stream.native import NativeStream, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)

WIN = 2_048
HOP = WIN // 2


def _hann(win):
    return np.hanning(win + 1)[:-1].astype(np.float32)


def _numpy_reference(mixture, enhance, win=WIN):
    """The pure-NumPy push-path semantics (zoom_api fallback)."""
    hop = win // 2
    w = _hann(win)
    norm = np.maximum(w[:hop] + w[hop:], 1e-6)
    out, tail, started = [], np.zeros(hop, np.float32), False
    for start in range(0, mixture.shape[1] - win + 1, hop):
        enhanced = enhance(mixture[:, start : start + win])
        weighted = enhanced * w
        if started:
            out.append((tail + weighted[:hop]) / norm)
        tail = weighted[hop:]
        started = True
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def _drive(stream, mixture, enhance, block_sizes):
    out, pos = [], 0
    i = 0
    n = mixture.shape[1]
    while pos < n:
        k = min(block_sizes[i % len(block_sizes)], n - pos)
        i += 1
        stream.push(mixture[:, pos : pos + k])
        pos += k
        for window in stream.windows():
            done = stream.commit(enhance(window))
            if done.size:
                out.append(done)
    return np.concatenate(out) if out else np.zeros(0, np.float32)


@pytest.mark.parametrize(
    "blocks", [[160], [1, 7, 64, 1024, 3], [WIN], [5 * WIN]]
)
def test_native_matches_numpy_reference(blocks):
    rng = np.random.default_rng(0)
    mixture = rng.standard_normal((2, 11 * HOP + 123)).astype(np.float32)
    enhance = lambda w: (w[0] - 0.25 * w[1]).astype(np.float32)
    ref = _numpy_reference(mixture, enhance)
    got = _drive(NativeStream(2, WIN), mixture, enhance, blocks)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_unit_gain_passthrough():
    """Identity enhancement must reconstruct the input at unit gain (the
    exact pairwise Hann normalization)."""
    rng = np.random.default_rng(1)
    mixture = rng.standard_normal((2, 8 * WIN)).astype(np.float32)
    got = _drive(NativeStream(2, WIN), mixture, lambda w: w[0], [997])
    # Output sample i corresponds to input sample i + hop (one-hop latency).
    assert got.size > 4 * WIN
    np.testing.assert_allclose(
        got, mixture[0, HOP : HOP + got.size], rtol=0, atol=1e-5
    )


def test_reset_restarts_stream():
    rng = np.random.default_rng(2)
    s = NativeStream(2, WIN)
    s.push(rng.standard_normal((2, 3 * WIN)).astype(np.float32))
    assert s.windows_ready() > 0
    s.reset()
    assert s.windows_ready() == 0
    # After reset the first commit is a warm-up again (returns nothing).
    mixture = rng.standard_normal((2, WIN)).astype(np.float32)
    s.push(mixture)
    window = next(iter(s.windows()))
    assert s.commit(window[0]).size == 0


def test_peek_commit_is_transactional():
    """A failed enhancement between peek and commit must lose no audio:
    the same window is re-presented, and after a successful commit the
    stream output is identical to a failure-free run (the NumPy fallback
    property the engine must match)."""
    rng = np.random.default_rng(5)
    mixture = rng.standard_normal((2, 4 * WIN)).astype(np.float32)
    enhance = lambda w: (w[0] + w[1]).astype(np.float32)

    s = NativeStream(2, WIN)
    s.push(mixture)
    out, first_failure_done = [], False
    while True:
        it = iter(s.windows())
        w = next(it, None)
        if w is None:
            break
        w_snapshot = w.copy()
        if not first_failure_done:
            # Simulate an enhancement exception: abandon without commit.
            first_failure_done = True
            w2 = next(iter(s.windows()))  # re-peek
            np.testing.assert_array_equal(w2, w_snapshot)  # same window
        done = s.commit(enhance(w_snapshot))
        if done.size:
            out.append(done)
    got = np.concatenate(out)
    ref = _numpy_reference(mixture, enhance)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)

    # commit with no pending window is an error, not silent corruption.
    s2 = NativeStream(2, WIN)
    with pytest.raises(RuntimeError):
        s2.commit(np.zeros(WIN, np.float32))


def test_geometry_and_shape_errors():
    with pytest.raises(ValueError):
        NativeStream(2, 2_047)  # win must be even (2*hop)
    s = NativeStream(2, WIN)
    with pytest.raises(ValueError):
        s.push(np.zeros((3, 100), np.float32))  # wrong channel count
    with pytest.raises(ValueError):
        s.commit(np.zeros(WIN - 1, np.float32))


def test_audiozoom_uses_native_and_matches_fallback():
    """AudioZoom.push must produce identical audio through the native and
    NumPy buffer layers (same deterministic enhancer)."""
    import jax.numpy as jnp

    from azoom import AudioZoom, PipelineConfig

    cfg = PipelineConfig(mic_dist=0.04)
    rng = np.random.default_rng(3)
    mixture = rng.standard_normal((2, 3 * cfg.win_size)).astype(np.float32)
    enhance = lambda w: jnp.asarray(w)[0] * 0.5

    z_native = AudioZoom(cfg=cfg, enhance_fn=enhance)
    assert z_native._native is not None
    z_numpy = AudioZoom(cfg=cfg, enhance_fn=enhance)
    z_numpy._native = None

    outs = []
    for z in (z_native, z_numpy):
        parts = []
        for start in range(0, mixture.shape[1], 1_600):
            parts.append(z.push(mixture[:, start : start + 1_600]))
        outs.append(np.concatenate(parts))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-5)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("fail_on", [2, 4])
def test_audiozoom_push_recovers_from_enhance_failure(use_native, fail_on):
    """Facade-level transactional property: if enhance_fn raises
    mid-stream, no audio is lost — retrying push produces exactly the
    audio a failure-free run produces. fail_on=4 hits a LATER window of
    a single multi-window push, so hops finalized by the earlier windows
    of that same push must survive the exception (they live on the
    object, not in a push-local)."""
    import jax.numpy as jnp

    from azoom import AudioZoom, PipelineConfig

    cfg = PipelineConfig(mic_dist=0.04)
    rng = np.random.default_rng(7)
    mixture = rng.standard_normal((2, 4 * cfg.win_size)).astype(np.float32)
    block = 2 * cfg.win_size  # multiple windows become ready per push

    calls = {"n": 0}

    def flaky(w):
        calls["n"] += 1
        if calls["n"] == fail_on:  # fail exactly once
            raise RuntimeError("transient device error")
        return jnp.asarray(w)[0] * 0.5

    z = AudioZoom(cfg=cfg, enhance_fn=flaky, native=use_native)
    assert (z._native is not None) == use_native
    parts = []
    for start in range(0, mixture.shape[1], block):
        try:
            parts.append(z.push(mixture[:, start : start + block]))
        except RuntimeError:
            parts.append(z.push(np.zeros((2, 0), np.float32)))  # retry
    got = np.concatenate(parts)

    z_ref = AudioZoom(
        cfg=cfg, enhance_fn=lambda w: jnp.asarray(w)[0] * 0.5,
        native=use_native,
    )
    ref = np.concatenate([
        z_ref.push(mixture[:, s : s + block])
        for s in range(0, mixture.shape[1], block)
    ])
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_concurrent_producer_consumer():
    """The engine's documented pattern: an audio callback pushing from one
    thread while a worker drains from another. ctypes releases the GIL,
    so without the internal mutex this corrupts the ring buffer."""
    import threading

    rng = np.random.default_rng(9)
    n = 40 * HOP
    mixture = rng.standard_normal((2, n)).astype(np.float32)
    enhance = lambda w: (0.75 * w[0]).astype(np.float32)
    s = NativeStream(2, WIN)

    def producer():
        for start in range(0, n, 160):  # 10 ms blocks
            s.push(mixture[:, start : start + 160])

    out, done = [], threading.Event()

    def consumer():
        while not (done.is_set() and s.windows_ready() == 0):
            for w in s.windows():
                out.append(s.commit(enhance(w.copy())))

    t_p = threading.Thread(target=producer)
    t_c = threading.Thread(target=consumer)
    t_c.start(); t_p.start()
    t_p.join(); done.set(); t_c.join(timeout=30)
    assert not t_c.is_alive(), "consumer did not drain within 30 s"
    got = np.concatenate([o for o in out if o.size])
    ref = _numpy_reference(mixture, enhance)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)

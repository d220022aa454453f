"""Streaming soak: long-run stability of the push() runtimes (round-4
VERDICT item 3's 'soak test' half; the TPU latency numbers live in
scripts/live_latency.py + RESULTS.md 'Live serving latency').

These run the stream mechanics (buffering, OLA, state carry, pipelined
double-buffering) over minutes of audio with a cheap enhancer, asserting
zero backlog growth, exact output accounting, and bounded per-push
service variance — the failure modes a soak exists to catch (state leaks,
buffer growth, drift)."""

import time

import numpy as np

from azoom import AudioZoom, PipelineConfig

CFG = PipelineConfig(mic_dist=0.04)
FS = CFG.fs


def _soak(pipelined, seconds=120, block=FS):
    rng = np.random.default_rng(3)
    z = AudioZoom(cfg=CFG, enhance_fn=lambda w: w[0], pipelined=pipelined)
    total_in = seconds * FS
    x = (rng.standard_normal((2, total_in)) * 0.3).astype(np.float32)
    out_sizes, times = [], []
    for i in range(seconds):
        t0 = time.perf_counter()
        out = z.push(x[:, i * block : (i + 1) * block])
        times.append(time.perf_counter() - t0)
        out_sizes.append(out.size)
    out_sizes.append(z.flush().size)
    produced = int(np.sum(out_sizes))
    # output accounting: everything except the OLA warm-up hop (and the
    # pipeline's in-flight window, drained by flush) must come back out
    expect = total_in - CFG.win_size // 2 - (0 if not pipelined else 0)
    assert abs(produced - expect) <= CFG.win_size, (produced, expect)
    # buffers must not grow: at most one window of input retained
    assert z._inbuf.shape[1] < CFG.win_size + block
    # service time must be stationary: the mean of the last quarter no
    # worse than 3x the mean of the first quarter (leak/backlog detector)
    q = len(times) // 4
    assert np.mean(times[-q:]) < 3.0 * np.mean(times[:q]) + 1e-3
    return times


def test_soak_direct_two_minutes():
    _soak(pipelined=False)


def test_soak_pipelined_two_minutes():
    _soak(pipelined=True)


def test_soak_lowlat_thirty_seconds():
    """Low-latency runtime (causal CRN) soak: 30 s of 64 ms (2-hop)
    pushes — state carries, one fetch per push, output accounting."""
    rng = np.random.default_rng(4)
    z = AudioZoom(cfg=CFG, latency="low")
    hop = 512
    block = 2 * hop
    n_pushes = 30 * FS // block
    x = (rng.standard_normal((2, n_pushes * block)) * 0.3).astype(np.float32)
    produced = 0
    for i in range(n_pushes):
        produced += z.push(x[:, i * block : (i + 1) * block]).size
    # all but the algorithmic warm-up must be finalized
    assert produced >= n_pushes * block - 4 * CFG.n_fft
    # input buffer bounded
    assert z._online._inbuf.shape[1] < block + hop

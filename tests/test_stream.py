"""Streaming runtime tests: chunk/OLA identity, long-file oracle SIR,
causal online mode."""

import jax
import jax.numpy as jnp
import numpy as np

from azoom.config import PipelineConfig
from azoom.dsp.stft import stft
from azoom.eval.projection import osinr_osir
from azoom.masks.oracle import ibm_noise_mask
from azoom.pipelines.oracle import oracle_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.stream.chunker import chunk_signal, overlap_add_chunks, streaming_enhance
from azoom.stream.online import online_enhance

CFG = PipelineConfig(mic_dist=0.04)


def test_chunk_ola_identity(rng):
    """Passthrough processing reconstructs the input exactly."""
    x = jnp.asarray(rng.standard_normal((2, 50_000)), jnp.float32)
    out = streaming_enhance(x, lambda ch: ch[0], win_size=32_000, hop=16_000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x[0]), atol=1e-5)


def test_chunk_signal_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 40_000)), jnp.float32)
    chunks, n = chunk_signal(x, 32_000, 16_000)
    assert n == 40_000
    assert chunks.shape == (2, 2, 32_000)
    recon = overlap_add_chunks(chunks[:, 0], 16_000, n)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x[0]), atol=1e-5)


def test_streaming_oracle_long_file():
    """6 s mixture through 2 s / 50 % chunked oracle MVDR keeps high SIR."""
    n = 96_000
    sigs = speech_like_batch(jax.random.PRNGKey(3), 3, n, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1:], 90.0, jnp.array([40.0, 130.0]), CFG.mic_dist, CFG.fs
    )
    # Stack refs with the mixture channels so each chunk carries its own
    # ground truth for the oracle mask.
    allsig = jnp.concatenate(
        [sc["mixture"], sc["target_ref"][None], sc["interference_ref"][None]]
    )  # (4, n)

    def process(chunk):
        return oracle_enhance(chunk[:2], chunk[2], chunk[3], CFG)

    out = streaming_enhance(allsig, process, win_size=32_000, hop=16_000)
    assert out.shape == (n,)
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    assert float(sir) > 20.0


def test_online_causal_enhance():
    n = 32_000
    sigs = speech_like_batch(jax.random.PRNGKey(5), 2, n, CFG.fs)
    sc = make_scene(
        sigs[0], sigs[1:], 90.0, jnp.array([40.0]), CFG.mic_dist, CFG.fs
    )
    S_tgt = stft(sc["target_ref"], CFG.n_fft, CFG.hop)
    S_int = stft(sc["interference_ref"], CFG.n_fft, CFG.hop)
    mask = ibm_noise_mask(S_tgt, S_int)
    out = online_enhance(sc["mixture"], mask, CFG)
    assert out.shape == (n,)
    _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
    _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"], sc["interference_ref"])
    # Causal estimate is weaker than batch but must still strongly improve.
    assert float(sir) - float(sir_in) > 10.0

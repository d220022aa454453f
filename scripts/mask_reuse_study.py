"""Streaming mask-reuse feasibility (the round-5 serving lever).

RESULTS "post-nano serving frontier": the serving step is net-bound at
the int8 MXU ceiling, but in the STREAMING regime each window shares
50 % of its frames with the previous one. With win = 32768 and chunk
hop = 16384 (both multiples of the 512-sample STFT hop) the STFT frames
of consecutive windows ALIGN: frame j of window k sees the same audio
as frame j+32 of window k-1 (boundary-pad edges excepted). So a live
stream can REUSE the previous window's masks for its first half and run
the net only on [new frames + a context margin].

This study measures both halves of the bet offline:
  speed  : nano int8 net at T=80 (full window, padded) vs T=48 (16
           context + 32 new frames) — the reuse compute.
  quality: scene-level SIR with full masks vs stitched reuse masks
           (prev[32:64) -> cur[0:32), net-on-[16:64) tail for the rest)
           over 16 blind scenes, nano int8 + MVDR + OLA.

Run: timeout 880 python scripts/mask_reuse_study.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401
from azoom.beam.mvdr import masked_mvdr
from azoom.config import PipelineConfig
from azoom.dsp.delays import steering_vector
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.eval.projection import osinr_osir
from azoom.models.pretrained import load_bundled
from azoom.pipelines.learned import predict_mask
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like_batch
from azoom.stream.chunker import chunk_signal, overlap_add_chunks

WIN, HOP = 32_768, 16_384  # frame-aligned streaming geometry (64 x 512)
cfg = PipelineConfig(mic_dist=0.04, win_size=WIN)
model, variables, fk = load_bundled("tpufpu_nano", quant=True)
freqs = rfft_freqs(cfg.n_fft, cfg.fs)
d = steering_vector(freqs, 90.0, cfg.mic_dist, cfg.c, 2)

CTX = 16          # context frames recomputed before the new half
NEW_START = 33    # frames [33, 65) are genuinely new in each window
# (window k frame j == window k-1 frame j+32; frame 32 straddles the
#  boundary pad of window k-1's tail, so reuse covers [0, 33) from
#  prev [32, 65) and the net recomputes [NEW_START-CTX, 65).)


def timed_net(T, B=128, iters=20):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 513, T, 4)) * 0.3,
        jnp.float32)

    def body(i, c):
        out = model.apply(variables, x + 1e-6 * c[:, None, None, None])
        return jnp.mean(jnp.abs(out), axis=(1, 2))

    loop = jax.jit(lambda c0: jax.lax.fori_loop(0, iters, body, c0))
    c0 = jnp.zeros((B,), jnp.float32)
    float(jnp.sum(loop(c0)))
    t0 = time.perf_counter()
    float(jnp.sum(loop(c0)))
    dt = (time.perf_counter() - t0) / iters
    print(f"net T={T}: {dt*1e3:6.2f} ms (B={B})", flush=True)
    return dt


def enhance_with_masks(chunks, masks, n):
    """chunks (C, 2, WIN), masks (C, F, T) -> OLA-reconstructed (n,)."""
    def one(ch, m):
        Y = stft(ch, cfg.n_fft, cfg.hop)
        S = masked_mvdr(Y, 1.0 - m, d, freqs, target_mask=m,
                        mask_floor=0.05, sigma=cfg.sigma,
                        hp_cutoff_hz=cfg.hp_cutoff_hz)
        return istft(S, cfg.n_fft, cfg.hop, length=WIN)

    outs = jax.vmap(one)(chunks, masks)
    return overlap_add_chunks(outs, HOP, n)


@jax.jit
def masks_for(chunks):
    Y = stft(chunks, cfg.n_fft, cfg.hop)
    return predict_mask(model, variables, Y, fk)


@jax.jit
def stitched_masks(chunks):
    """Faithful streaming reuse: chunk 0's mask is full; every later
    window takes frames [0, 33) from the PREVIOUS stitched mask's
    [32, 65) and frames [33, 65) from a net pass over only 48 frames
    ([17, 65) — 16 context + the new half, the truncated-context
    compute a live server would run). Recursion via lax.scan mirrors
    the stream (reused masks beget reused masks)."""
    Y = stft(chunks, cfg.n_fft, cfg.hop)  # (C, 2, F, 65)
    full0 = predict_mask(model, variables, Y[0], fk)  # (F, 65)
    tails = predict_mask(model, variables, Y[1:, :, :, 17:65], fk)

    def step(prev, tail):
        m = jnp.concatenate([prev[:, 32:65], tail[:, 16:48]], axis=-1)
        return m, m

    _, rest = jax.lax.scan(step, full0, tails)
    return jnp.concatenate([full0[None], rest], axis=0)


def main():
    # --- speed ---
    t_full = timed_net(80)
    t_reuse = timed_net(48)
    print(f"net reuse compute = {t_reuse/t_full:.2f}x of full "
          f"(projected serving step: net share scales the same)", flush=True)

    # --- quality ---
    n = 8 * cfg.fs + WIN  # ~8 s streams
    sirs_full, sirs_reuse = [], []
    for seed in range(16):
        sigs = speech_like_batch(jax.random.PRNGKey(seed), 3, n, cfg.fs)
        sc = make_scene(sigs[0], sigs[1:], 90.0,
                        jnp.asarray([40.0, 130.0]), cfg.mic_dist, cfg.fs)
        chunks, _ = chunk_signal(sc["mixture"], WIN, HOP)
        mf = masks_for(chunks)
        ms = stitched_masks(chunks)
        out_f = enhance_with_masks(chunks, mf, n)
        out_s = enhance_with_masks(chunks, ms, n)
        _, sin = osinr_osir(sc["mixture"][0], sc["target_ref"],
                            sc["interference_ref"])
        _, sf = osinr_osir(out_f, sc["target_ref"], sc["interference_ref"])
        _, ss = osinr_osir(out_s, sc["target_ref"], sc["interference_ref"])
        sirs_full.append(float(sf - sin))
        sirs_reuse.append(float(ss - sin))
    sirs_full, sirs_reuse = np.asarray(sirs_full), np.asarray(sirs_reuse)
    print(f"full masks : +{sirs_full.mean():.2f} ± "
          f"{sirs_full.std()/4:.2f} dB", flush=True)
    print(f"reuse masks: +{sirs_reuse.mean():.2f} ± "
          f"{sirs_reuse.std()/4:.2f} dB "
          f"(delta {sirs_reuse.mean()-sirs_full.mean():+.2f})", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 serving-step stage profile (nano int8, fast DFT, B=128).

Times each stage of the flagship serving step in isolation (in-jit
fori_loop, scalar-fetch completion — docs/DESIGN.md section 8) plus the
full step at B=128/256, to locate the remaining DSP/beamforming share
after the round-3 net cuts (RESULTS 'Stage breakdown, nano era': STFT+
features 2.8 ms, net 8.3 ms, MVDR+post+iSTFT 3.9 ms).

Run: timeout 900 python scripts/profile_serving_r4.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.dsp.stft import istft, rfft_freqs, stft
from azoom.dsp.delays import steering_vector
from azoom.masks.features import physics_aware_features
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.pallas.mvdr_kernel import masked_mvdr_pallas
from azoom.pipelines.learned import learned_enhance
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

cfg = PipelineConfig(mic_dist=0.04)
ITERS = 20
use_pallas = jax.default_backend() == "tpu"

model = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=True,
               bneck=4, dec_div=2, enc_div=2)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
variables = {"params": state.params, "batch_stats": state.batch_stats}
variables = calibrate_act_scales(
    model, variables,
    (synth_batch(jax.random.PRNGKey(i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(1, 3)))


def timed(name, fn, B, *args):
    """fn(carry (B,), *args) -> stage output; the loop reduces the output
    back into a (B,) carry so iterations serialize and nothing DCEs.
    args are passed as jit ARGUMENTS (axon cannot constant-fold complex
    device arrays through the mlir handler)."""

    def loop(c0, *a):
        def body(i, c):
            out = fn(c, *a)
            out = jax.tree_util.tree_leaves(out)[0]
            red = jnp.mean(jnp.abs(out).astype(jnp.float32),
                           axis=tuple(range(1, out.ndim)))
            return red[:B] if red.shape[0] >= B else jnp.broadcast_to(
                jnp.mean(red), (B,))

        return jax.lax.fori_loop(0, ITERS, body, c0)

    loop = jax.jit(loop)
    c0 = jnp.zeros((B,), jnp.float32)
    float(jnp.sum(loop(c0, *args)))
    t0 = time.perf_counter()
    float(jnp.sum(loop(c0, *args)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
for B in (128, 256):
    n = cfg.win_size
    mix = jnp.asarray(rng.standard_normal((B, 2, n)) * 0.1, jnp.float32)
    print(f"--- B={B}", flush=True)

    # full step (carry-perturbed so iterations are dependent)
    timed("full step", lambda c, m: learned_enhance(
        m + 1e-6 * c[:, None, None], model, variables, cfg,
        beamformer="mvdr", feature_kind="physics", use_pallas=use_pallas,
        dsp_precision="fast"), B, mix)

    Y0 = stft(mix, cfg.n_fft, cfg.hop, precision="fast")
    freqs = rfft_freqs(cfg.n_fft, cfg.fs)
    d = steering_vector(freqs, 90.0, cfg.mic_dist, cfg.c, 2)
    feats0 = physics_aware_features(Y0)
    fp, T = pad_frames(feats0, 16)
    mask0 = model.apply(variables, fp)[..., :T]

    if B == 128:
        timed("stft only", lambda c, m: stft(
            m + 1e-6 * c[:, None, None], cfg.n_fft, cfg.hop,
            precision="fast"), B, mix)
        timed("features only", lambda c, Y: physics_aware_features(
            Y * (1 + 1e-9 * c[:, None, None, None])), B, Y0)
        timed("net only (padded)", lambda c, f: model.apply(
            variables, f + 1e-6 * c[:, None, None, None]), B, fp)
        if use_pallas:
            timed("pallas mvdr+post", lambda c, Y, m, dd: masked_mvdr_pallas(
                Y * (1 + 1e-9 * c[:, None, None, None]), 1.0 - m,
                dd, freqs, target_mask=m, mask_floor=0.05,
                sigma=cfg.sigma, hp_cutoff_hz=cfg.hp_cutoff_hz),
                B, Y0, mask0, d)
        S0 = Y0[:, 0]
        timed("istft only", lambda c, S: istft(
            S * (1 + 1e-9 * c[:, None, None]), cfg.n_fft, cfg.hop,
            length=n, precision="fast"), B, S0)

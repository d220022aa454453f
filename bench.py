"""Headline benchmark: streaming learned-mask enhancement throughput.

Measures the flagship inference path (physics-aware TPUFPU mask net +
batched masked-MVDR + iSTFT, the Final_pipeline equivalent) on the default
backend (one TPU chip under the driver), batched over parallel streams.

Prints ONE JSON line:
  metric      : audio realtime factor per chip (seconds of 16 kHz stereo
                audio enhanced per wall-clock second)
  vs_baseline : ratio vs. the reference's real-time-capable CPU pipeline
                (RTF ~= 1x, tf_lite_version/inference.py:387 instruments
                exactly this number; BASELINE.json targets >= 100x)

Also embeds secondary fields: STFT frames/sec/chip (the BASELINE.json
primary metric) and oracle-SIR parity on the same device.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def _wait_for_backend(max_wait_s: float = 600.0) -> None:
    """Retry backend init: the axon TPU tunnel can be transiently
    UNAVAILABLE (observed outages of minutes); don't lose the round's
    benchmark to a flake. Gives up after ``max_wait_s`` and lets the
    real error surface."""
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            jax.devices()
            return
        except Exception as e:  # backend setup errors are RuntimeError-ish
            if time.monotonic() > deadline:
                raise
            print(f"# backend unavailable ({type(e).__name__}), retrying...",
                  file=sys.stderr, flush=True)
            time.sleep(30.0)


def main():
    _wait_for_backend()
    import azoom  # noqa: F401  (enables the persistent compile cache)
    from azoom.config import PipelineConfig
    from azoom.eval.projection import osinr_osir
    from azoom.models.unet import TPUFPU
    from azoom.pipelines.learned import learned_enhance
    from azoom.pipelines.oracle import oracle_enhance
    from azoom.sim.farfield import make_scene
    from azoom.sim.signals import speech_like_batch
    from azoom.train.data import synth_batch
    from azoom.train.loop import create_state

    cfg = PipelineConfig(mic_dist=0.04)
    fs = cfg.fs

    # Flagship model at production size: nano TPUFPU (base=64, fold=4,
    # bneck=4, dec_div=2, enc_div=2, 4-ch physics) — the MXU-shaped net
    # (frequency space-to-depth stem; every conv level >= 64 channels on
    # 4x fewer rows) with the round-3 slim bottleneck (256 channels) and
    # half-width non-final decoder AND encoder levels (4.1M params). The
    # speed-of-light study showed the int8 net runs at the chip's matmul
    # ceiling, so every speedup here comes from MAC cuts. Quality at this
    # architecture is held by 40k steps of distillation from the full
    # slim net: matched-or-better on every measured facet including the
    # real 1 cm fixture (mask acc 0.852, blind reverb +21.77 vs +21.45,
    # real fixture +24.68 vs +24.66; RESULTS.md round 3; bundled as
    # tpufpu_b64s4d2e2_phy_int8.npz). quant=True = the int8 serving path
    # with calibrated static act scales. Upsampling, output head and all
    # beamforming math stay bf16/f32.
    model = TPUFPU(
        base=64, fold=4, dtype=jnp.bfloat16, quant=True,
        bneck=4, dec_div=2, enc_div=2,
    )
    probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
    state = create_state(model, jax.random.PRNGKey(0), probe["features"].shape)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # Static activation scales (99.9th-percentile of |x| over a few
    # representative batches — NOT max-abs, which codes heavy post-ReLU
    # tails at full range and costs ~6 dB SIR): removes the per-conv
    # full-tensor reduction from the serving hot path (QConv docstring;
    # 1.17x per conv measured).
    from azoom.models.quantize import calibrate_act_scales

    variables = calibrate_act_scales(
        model, variables,
        (synth_batch(jax.random.PRNGKey(i), 4, cfg, "physics",
                     cfg.win_size)["features"] for i in range(1, 4)),
    )

    batch = 128         # parallel 2 s chunks per step (throughput knee on v5e)
    n = cfg.win_size    # 32000 samples = 2 s per chunk
    iters = 10
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((batch, 2, n)) * 0.1, jnp.float32)

    # Timing methodology: the axon backend's block_until_ready does NOT
    # wait for remote completion, and per-dispatch tunnel round-trips are
    # ~100s of ms. So the iteration loop runs INSIDE one jit with a data
    # dependence between iterations, and completion is forced by fetching
    # a scalar reduction (see azoom.utils.profiling).
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def bench_loop(mix, variables):
        def body(i, carry):
            perturbed = mix + 1e-6 * carry[:, None, :]
            return learned_enhance(
                perturbed, model, variables, cfg,
                beamformer="mvdr", feature_kind="physics",
                use_pallas=use_pallas,
                # Single-pass bf16 matmul-DFT for STFT/iSTFT: 1.32x the
                # serving step at a ~-54 dB error floor — measured ZERO
                # blind-SIR cost (32-scene reverb A/B identical, real
                # fixture -0.03 dB; scripts/profile_dsp_precision.py).
                dsp_precision="fast",
            )

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((batch, n)))

    # Warmup / compile (forced by the scalar fetch).
    float(jnp.sum(jnp.abs(bench_loop(mix, variables))))

    # Best of 3 timed passes: one pass is 10 in-jit iterations already,
    # but ambient host/tunnel noise on this shared machine moves single
    # passes by ~10 % run to run (round 4 measured 17.0-18.6kx across
    # identical runs); the minimum is the honest capability number.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = bench_loop(mix, variables)
        float(jnp.sum(jnp.abs(out)))
        dt = min(dt, time.perf_counter() - t0)

    audio_seconds = iters * batch * (n / fs)
    rtf = audio_seconds / dt
    frames_per_chunk = probe["features"].shape[2]
    frames_per_sec = iters * batch * frames_per_chunk / dt

    # Oracle-SIR parity check on the same device (BASELINE: 36.24 dB ref).
    # Preferred: the reference repo's own committed real-speech fixture
    # (36.06 dB measured); fallback: synthetic speech-like scene.
    from pathlib import Path

    ref_inputs = Path("/root/reference/data/inputs")
    if (ref_inputs / "test_mixture.wav").exists():
        from azoom.io.wav import read_wav

        mix_w, _ = read_wav(ref_inputs / "test_mixture.wav")
        tgt_w, _ = read_wav(ref_inputs / "test_target_ref.wav")
        itf_w, _ = read_wav(ref_inputs / "test_interferer_ref.wav")
        gen1 = PipelineConfig(n_fft=512, hop=256, mic_dist=0.01, sigma=1e-9)
        enh = oracle_enhance(
            jnp.asarray(mix_w.T), jnp.asarray(tgt_w), jnp.asarray(itf_w), gen1
        )
        _, sir = osinr_osir(enh, jnp.asarray(tgt_w), jnp.asarray(itf_w))
    else:
        sigs = speech_like_batch(jax.random.PRNGKey(7), 3, n, fs)
        sc = make_scene(
            sigs[0], sigs[1:], 90.0, jnp.asarray([40.0, 130.0]), cfg.mic_dist, fs
        )
        enh = oracle_enhance(
            sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg
        )
        _, sir = osinr_osir(enh, sc["target_ref"], sc["interference_ref"])

    print(
        json.dumps(
            {
                "metric": "audio_realtime_factor_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 1.0, 2),
                "stft_frames_per_sec_per_chip": round(frames_per_sec, 1),
                "oracle_sir_db": round(float(sir), 2),
                "batch": batch,
                "chunk_seconds": n / fs,
                "iters": iters,
                "precision": "int8-MXU convs + bf16 + f32 beamforming",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()

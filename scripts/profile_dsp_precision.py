"""Does single-pass-bf16 DFT (dsp_precision='fast') buy end-to-end serving
throughput without costing quality? Times the full nano int8 serving step
(B=128 x 2 s chunks) at both precisions, then scores 32 blind reverb
scenes and the real 1 cm fixture at both."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401
from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.io.wav import read_wav
from azoom.models.pretrained import load_bundled
from azoom.pipelines.learned import learned_enhance

B, ITERS = 128, 20
cfg = PipelineConfig(mic_dist=0.04)
net, v, feats = load_bundled("tpufpu_nano", quant=True)
rng = np.random.default_rng(0)
mix = jnp.asarray(rng.standard_normal((B, 2, cfg.win_size)) * 0.1, jnp.float32)

for prec in ("exact", "fast"):
    def full_loop(mix, v, prec=prec):
        def body(i, carry):
            return learned_enhance(mix + 1e-6 * carry[:, None, :], net, v,
                                   cfg, beamformer="mvdr", feature_kind=feats,
                                   use_pallas=True, dsp_precision=prec)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((B, cfg.win_size)))
    loop = jax.jit(full_loop)
    float(jnp.sum(jnp.abs(loop(mix, v))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(mix, v))))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{prec:6s} full step {dt*1e3:6.2f} ms -> {B*2.0/dt:,.0f}x realtime",
          flush=True)

# quality: 32 blind reverb scenes, scored at both precisions
from azoom.sim.scene import simulate_room_scene
from azoom.config import RoomConfig
from azoom.sim.signals import speech_like_batch

rc = RoomConfig().with_mic_dist(0.04)
for prec in ("exact", "fast"):
    imps = []
    for i in range(32):
        sigs = speech_like_batch(jax.random.PRNGKey(5000 + i), 3, cfg.win_size,
                                 cfg.fs)
        sc = simulate_room_scene(jax.random.PRNGKey(i), sigs[0], sigs[1:], rc,
                                 fs=cfg.fs)
        out = learned_enhance(sc["mixture"], net, v, cfg, beamformer="mvdr",
                              feature_kind=feats, use_pallas=True,
                              dsp_precision=prec)
        _, sir = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
        _, sir_in = osinr_osir(sc["mixture"][0], sc["target_ref"],
                               sc["interference_ref"])
        imps.append(float(sir) - float(sir_in))
    imps = np.asarray(imps)
    print(f"{prec:6s} blind reverb (32 scenes) +{imps.mean():.2f} "
          f"± {imps.std()/np.sqrt(len(imps)):.2f} dB", flush=True)

# real fixture
REF = Path("/root/reference/data/inputs")
if (REF / "test_mixture.wav").exists():
    RCFG = PipelineConfig(n_fft=1024, hop=512, mic_dist=0.01, sigma=1e-7)
    rmix, fs = read_wav(REF / "test_mixture.wav")
    rtgt, _ = read_wav(REF / "test_target_ref.wav")
    ritf, _ = read_wav(REF / "test_interferer_ref.wav")
    n = min(rmix.shape[0], len(rtgt), len(ritf))
    rmix, rtgt, ritf = (jnp.asarray(rmix[:n].T), jnp.asarray(rtgt[:n]),
                        jnp.asarray(ritf[:n]))
    for prec in ("exact", "fast"):
        out = learned_enhance(rmix, net, v, RCFG, feature_kind=feats,
                              train_mic_dist=0.04, dsp_precision=prec)
        _, sir = osinr_osir(out, rtgt, ritf)
        _, sir_in = osinr_osir(rmix[0], rtgt, ritf)
        print(f"{prec:6s} REAL 1cm fixture +{float(sir)-float(sir_in):.2f} dB",
              flush=True)

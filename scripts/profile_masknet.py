"""Profile the TPUFPU int8 serving step on the real chip, stage by stage.

Decides the scope of a fused Pallas conv kernel (VERDICT round-2 #9): how
much of the mask-net step is MXU conv work vs elementwise/layout overhead
(quantize/dequant, pool, upsample, skip concats, stem/head).

Every timing follows the project rule (azoom.utils.profiling): the loop
lives inside ONE jit with a data dependence between iterations, and
completion is forced by a scalar fetch.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import azoom  # noqa: F401  (compile cache)
from azoom.config import PipelineConfig
from azoom.models.quantize import calibrate_act_scales
from azoom.models.unet import TPUFPU, pad_frames
from azoom.pipelines.learned import learned_enhance
from azoom.train.data import synth_batch
from azoom.train.loop import create_state

B = 128
ITERS = 10

cfg = PipelineConfig(mic_dist=0.04)
model_q = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=True)
model_f = TPUFPU(base=64, fold=4, dtype=jnp.bfloat16, quant=False)
probe = synth_batch(jax.random.PRNGKey(0), 1, cfg, "physics", cfg.win_size)
state = create_state(model_q, jax.random.PRNGKey(0), probe["features"].shape)
variables = {"params": state.params, "batch_stats": state.batch_stats}
variables_q = calibrate_act_scales(
    model_q, variables,
    (synth_batch(jax.random.PRNGKey(i), 4, cfg, "physics",
                 cfg.win_size)["features"] for i in range(1, 4)),
)

rng = np.random.default_rng(0)
feats = jnp.asarray(
    rng.standard_normal((B,) + probe["features"].shape[1:]), jnp.float32
)
feats, _ = pad_frames(feats, 16)
print("feature shape:", feats.shape, flush=True)
mix = jnp.asarray(rng.standard_normal((B, 2, cfg.win_size)) * 0.1, jnp.float32)


def timed(name, make_loop, *args):
    loop = jax.jit(make_loop)
    out = loop(*args)
    float(jnp.sum(jnp.abs(out)))  # compile + warm
    t0 = time.perf_counter()
    out = loop(*args)
    float(jnp.sum(jnp.abs(out)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms/step", flush=True)
    return dt


# --- 1. full serving step (the bench loop body) -------------------------
def full_loop(mix, variables):
    def body(i, carry):
        perturbed = mix + 1e-6 * carry[:, None, :]
        return learned_enhance(
            perturbed, model_q, variables, cfg,
            beamformer="mvdr", feature_kind="physics", use_pallas=True,
        )
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((B, cfg.win_size)))

t_full = timed("full step (stft+net+mvdr+istft)", full_loop, mix, variables_q)


# --- 2. mask net only, int8 calibrated ----------------------------------
def net_loop_q(feats, variables):
    def body(i, carry):
        x = feats + 1e-6 * carry[..., None]
        return model_q.apply(variables, x)
    return jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros(feats.shape[:1] + feats.shape[1:3])
    )

t_net_q = timed("mask net int8 (calibrated)", net_loop_q, feats, variables_q)


# --- 3. mask net float bf16 ----------------------------------------------
def net_loop_f(feats, variables):
    def body(i, carry):
        x = feats + 1e-6 * carry[..., None]
        return model_f.apply(variables, x)
    return jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros(feats.shape[:1] + feats.shape[1:3])
    )

t_net_f = timed("mask net bf16 (float)", net_loop_f, feats, variables)


# --- 4. conv-only surrogates ---------------------------------------------
# Exact TPUFPU conv shapes (base=64, fold=4, input (B, 129, 128, 16)).
FR = 129
T0 = feats.shape[2]  # 128
C0 = 16

def conv_shapes():
    """[(T, cin, cout, kind)] for every conv in TPUFPU forward order."""
    s = []
    # encoder
    s += [(T0, C0, 64, "c"), (T0, 64, 64, "c")]                       # e1
    s += [(T0 // 2, 64, 128, "c"), (T0 // 2, 128, 128, "c"), (T0 // 2, 128, 128, "c")]
    s += [(T0 // 4, 128, 256, "c"), (T0 // 4, 256, 256, "c"), (T0 // 4, 256, 256, "c")]
    # bottleneck
    s += [(T0 // 8, 256, 512, "c")] + [(T0 // 8, 512, 512, "c")] * 4
    # decoder (upsample = 1x2 transpose conv, then convs on concat)
    s += [(T0 // 4, 512, 256, "u"), (T0 // 4, 512, 256, "c"),
          (T0 // 4, 256, 256, "c"), (T0 // 4, 256, 256, "c")]
    s += [(T0 // 2, 256, 128, "u"), (T0 // 2, 256, 128, "c"),
          (T0 // 2, 128, 128, "c"), (T0 // 2, 128, 128, "c")]
    s += [(T0, 128, 64, "u"), (T0, 128, 64, "c"), (T0, 64, 64, "c")]
    return s

SHAPES = conv_shapes()
gmac = sum(
    FR * t * ci * co * (9 if k == "c" else 2) for t, ci, co, k in SHAPES
) / 1e9
print(f"conv MACs per image: {gmac:.2f} GMac "
      f"(batch {B}: {gmac*B/1e3:.2f} TMac/step)", flush=True)

kernels = {}
for idx, (t, ci, co, kind) in enumerate(SHAPES):
    if kind == "c":
        kernels[idx] = jnp.asarray(
            rng.integers(-127, 127, (3, 3, ci, co)), jnp.int8
        )
    else:
        kernels[idx] = jnp.asarray(
            rng.standard_normal((1, 2, co, ci)), jnp.bfloat16
        )

def run_convs(x0, epilogue):
    """Chain every conv at its true shape; `epilogue` maps int32 conv out
    -> int8 next input ('cheap' = bare astype, 'full' = QConv math)."""
    dn = None
    acts = {}
    x = x0  # int8 (B, FR, T0, C0)
    for idx, (t, ci, co, kind) in enumerate(SHAPES):
        if x.shape[2] != t or x.shape[3] != ci:
            # pool / upsample / concat boundaries: resize with a cheap
            # reshape-free slice/tile to keep only conv+epilogue in the
            # measurement (layout glue is NOT what this surrogate times).
            if x.shape[2] > t:
                x = x[:, :, :t, :]
            elif x.shape[2] < t:
                x = jnp.repeat(x, t // x.shape[2], axis=2)
            if x.shape[3] > ci:
                x = x[..., :ci]
            elif x.shape[3] < ci:
                x = jnp.tile(x, (1, 1, 1, ci // x.shape[3]))
        if kind == "c":
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernels[idx].shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x, kernels[idx], (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            x = epilogue(y)
        else:
            xf = (x.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)
            y = jax.lax.conv_transpose(
                xf, kernels[idx].transpose(0, 1, 3, 2), (1, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.clip(jnp.round(y.astype(jnp.float32) / 0.05),
                         -127, 127).astype(jnp.int8)
    return x

x0 = jnp.asarray(rng.integers(-127, 127, (B, FR, T0, C0)), jnp.int8)

def cheap_epi(y):
    return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

def full_epi(y):
    yf = y.astype(jnp.float32) * 7.8e-5 + 0.01      # dequant scale + bias
    yf = jnp.maximum(yf, 0.0)                        # ReLU (BN folded)
    return jnp.clip(jnp.round(yf / 0.05), -127, 127).astype(jnp.int8)

def convs_loop(x0, epi):
    def body(i, carry):
        x = jnp.clip(x0 + carry[:, :1, :1, :1], -127, 127).astype(jnp.int8)
        out = run_convs(x, epi)
        return (out[:, :1, :1, :1] & 1).astype(jnp.int8)
    return jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros((B, 1, 1, 1), jnp.int8))

t_cheap = timed("convs only (bare int8 chain)",
                lambda x: convs_loop(x, cheap_epi), x0)
t_fullepi = timed("convs + QConv epilogue",
                  lambda x: convs_loop(x, full_epi), x0)

print("\n--- budget ---", flush=True)
print(f"full step        : {t_full*1e3:7.2f} ms")
print(f"mask net int8    : {t_net_q*1e3:7.2f} ms ({t_net_q/t_full*100:.0f}% of step)")
print(f"mask net bf16    : {t_net_f*1e3:7.2f} ms")
print(f"conv floor       : {t_cheap*1e3:7.2f} ms ({t_cheap/t_net_q*100:.0f}% of int8 net)")
print(f"conv + epilogue  : {t_fullepi*1e3:7.2f} ms")
print(f"elementwise cost : {(t_fullepi-t_cheap)*1e3:7.2f} ms")
print(f"glue (pool/up/concat/stem/head): {(t_net_q-t_fullepi)*1e3:7.2f} ms")
tmac = gmac * B / 1e3
print(f"conv floor eff   : {tmac/t_cheap:.1f} TMac/s "
      f"({tmac/t_cheap/197:.0%} of v5e int8 peak ~197 TMac/s)")

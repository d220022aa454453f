"""Can int8 matmuls beat the 56%-of-peak XLA int8 conv on this chip?

Times XLA int8/bf16 dots at the TPUFPU im2col shapes, plus a minimal
Pallas tiled int8 matmul, to decide whether an im2col-in-VMEM Pallas conv
can outrun jax.lax.conv_general_dilated's int8 lowering.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import azoom  # noqa: F401

ITERS = 30
rng = np.random.default_rng(0)


def timed(name, fn, *args, gmac=None):
    loop = jax.jit(
        lambda a0, *rest: jax.lax.fori_loop(
            0, ITERS,
            lambda i, c: fn(
                (a0 + c[:1, :1].astype(a0.dtype)).astype(a0.dtype), *rest
            ),
            fn(a0, *rest),
        )
    )
    out = loop(*args)
    float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(*args).astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / ITERS
    eff = f"  {gmac/dt/1e3:7.1f} TMac/s ({gmac/dt/1e3/197*100:4.0f}% int8 peak)" if gmac else ""
    print(f"{name:44s} {dt*1e3:8.3f} ms{eff}", flush=True)
    return dt


def xla_dot(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def pallas_mm(x, w, bm=512, bn=512):
    M, K = x.shape
    _, N = w.shape

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return pl.pallas_call(
        kern,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )(x, w)


for (M, K, N) in [
    (8192, 4608, 512),   # bottleneck conv as im2col (rows x 9*Cin -> Cout)
    (8192, 512, 512),    # single-tap granularity
    (16384, 2304, 256),  # e3-level conv as im2col
    (16384, 576, 64),    # e1-level
]:
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    g = M * K * N / 1e9
    timed(f"XLA dot int8   {M}x{K}x{N}", xla_dot, x8, w8, gmac=g)
    timed(f"Pallas mm int8 {M}x{K}x{N}", pallas_mm, x8, w8, gmac=g)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    dt = timed(
        f"XLA dot bf16   {M}x{K}x{N}",
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        xb, wb,
    )
    print(f"  bf16 eff: {g/dt/1e3:.1f} TMac/s ({g/dt/1e3/98.5*100:.0f}% bf16 peak)")

# The actual conv as XLA sees it, one level at a time (batch folded into
# rows is not possible for conv, so use the real NHWC shapes, B=128):
for (F, T, Ci, Co) in [(129, 8, 512, 512), (129, 16, 256, 256),
                       (129, 64, 64, 64)]:
    B = 128
    x8 = jnp.asarray(rng.integers(-127, 127, (B, F, T, Ci)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, Ci, Co)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x8.shape, k8.shape, ("NHWC", "HWIO", "NHWC"))
    g = B * F * T * Ci * Co * 9 / 1e9
    timed(
        f"XLA conv3x3 int8 B{B} {F}x{T}x{Ci}->{Co}",
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        ),
        x8, k8, gmac=g,
    )

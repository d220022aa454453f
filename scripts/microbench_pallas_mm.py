"""Pallas int8 matmul block-size sweep at the im2col bottleneck shape.

Decides go/no-go for the fused conv kernel: the real TPUFPU net already
runs at ~130 TMac/s (66% of int8 peak) under XLA; a Pallas conv only
helps if a tuned int8 matmul clearly beats that.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import azoom  # noqa: F401

rng = np.random.default_rng(0)

def timed(name, fn, x, w, gmac, iters=200):
    def dep(w, c):
        d = (c[:1, :1] & 1).astype(w.dtype)
        return w.at[:1, :1].add(d)
    loop = jax.jit(lambda a0, w0: jax.lax.fori_loop(
        0, iters, lambda i, c: fn(a0, dep(w0, c)), fn(a0, w0)))
    try:
        float(jnp.sum(jnp.abs(loop(x, w).astype(jnp.float32))))
    except Exception as e:
        print(f"{name:40s} FAILED: {str(e)[:90]}", flush=True)
        return None
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(x, w).astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.4f} ms  {gmac/dt/1e3:7.1f} TMac/s "
          f"({gmac/dt/1e3/197*100:4.0f}% int8 peak)", flush=True)
    return dt

def pallas_mm(bm, bn, bk=None):
    def f(x, w):
        M, K = x.shape; _, N = w.shape
        if bk is None:  # full-K blocks
            def kern(x_ref, w_ref, o_ref):
                o_ref[:] = jax.lax.dot_general(
                    x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            return pl.pallas_call(kern, grid=(M // bm, N // bn),
                in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                          pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))(x, w)
        def kern(x_ref, w_ref, o_ref):
            k = pl.program_id(2)
            @pl.when(k == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return pl.pallas_call(kern, grid=(M // bm, N // bn, K // bk),
            in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                      pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))(x, w)
    return f

M, K, N = 21504, 4608, 512
x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
g = M * K * N / 1e9
timed("XLA dot (reference)", lambda x, w: jax.lax.dot_general(
    x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32),
    x8, w8, g)
for bm, bn, bk in [(512, 512, None), (256, 512, None), (1024, 256, None),
                   (512, 512, 2304), (1024, 512, 1152), (2048, 512, 576),
                   (1024, 512, 2304)]:
    timed(f"Pallas bm={bm} bn={bn} bk={bk}", pallas_mm(bm, bn, bk), x8, w8, g)

# bf16 comparison at same shape (is int8 even the right mode?)
xb, wb = x8.astype(jnp.bfloat16), w8.astype(jnp.bfloat16)
timed("XLA dot bf16 (98.5 TMac/s peak)", lambda x, w: jax.lax.dot_general(
    x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32),
    xb, wb, g)

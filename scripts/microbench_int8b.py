"""Int8 matmul efficiency at TPUFPU im2col shapes.

The axon dispatch floor is ~1 ms per jit call, so each config runs enough
in-jit iterations (serial data dependence) that the floor is <2% of total;
a null loop calibrates the overhead.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import azoom  # noqa: F401

rng = np.random.default_rng(0)

def timed(name, fn, *args, gmac=None, iters=200):
    # Serial dependence threaded through the SMALL operand (w) so the
    # per-iteration copy is a few KB, not the whole activation matrix.
    def dep(w, c):
        d = (c[:1, :1] & 1).astype(w.dtype)
        return w.at[:1, :1].add(d)
    if len(args) == 2:
        loop = jax.jit(lambda a0, w0: jax.lax.fori_loop(
            0, iters, lambda i, c: fn(a0, dep(w0, c)), fn(a0, w0)))
    else:
        loop = jax.jit(lambda a0: jax.lax.fori_loop(
            0, iters, lambda i, c: fn(dep(a0, c)), fn(a0)))
    float(jnp.sum(jnp.abs(loop(*args).astype(jnp.float32))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(*args).astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters
    eff = f"  {gmac/dt/1e3:7.1f} TMac/s ({gmac/dt/1e3/197*100:4.0f}% int8 peak)" if gmac else ""
    print(f"{name:44s} {dt*1e3:8.4f} ms{eff}", flush=True)
    return dt

def xla_dot(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

def pallas_mm(x, w, bm=1024, bn=512):
    M, K = x.shape; _, N = w.shape
    bn = min(bn, N); bm = min(bm, M)
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
    return pl.pallas_call(kern, grid=(M // bm, N // bn),
        in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))(x, w)

x0 = jnp.asarray(rng.integers(-127, 127, (256, 256)), jnp.int8)
timed("null (loop overhead)", lambda x: x * 1, x0)

# im2col shapes per level, 1/8 of the batch-folded rows (efficiency is
# per-tile; smaller M keeps host->device transfer sane)
for (M, K, N) in [
    (21504, 4608, 512),   # bottleneck (K = 9*512)
    (21504, 512, 512),    # per-tap granularity at bottleneck
    (43008, 2304, 256),   # e3
    (86016, 1152, 128),   # e2
    (172032, 576, 64),    # e1
]:
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    g = M * K * N / 1e9
    timed(f"XLA dot int8   {M}x{K}x{N}", xla_dot, x8, w8, gmac=g)
    timed(f"Pallas mm int8 {M}x{K}x{N}", pallas_mm, x8, w8, gmac=g)

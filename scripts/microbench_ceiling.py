"""Is ~130 TMac/s the chip's practical int8 ceiling, or a shape artifact?
Canonical square/wide int8 matmuls + one bf16 reference."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
import azoom  # noqa: F401

rng = np.random.default_rng(0)

def timed(name, fn, x, w, gmac, peak, iters=100):
    def dep(w, c):
        return w.at[:1, :1].add((c[:1, :1] != 0).astype(w.dtype))
    loop = jax.jit(lambda a0, w0: jax.lax.fori_loop(
        0, iters, lambda i, c: fn(a0, dep(w0, c)), fn(a0, w0)))
    float(jnp.sum(jnp.abs(loop(x, w).astype(jnp.float32))))
    t0 = time.perf_counter()
    float(jnp.sum(jnp.abs(loop(x, w).astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.4f} ms  {gmac/dt/1e3:7.1f} TMac/s "
          f"({gmac/dt/1e3/peak*100:4.0f}% of {peak} peak)", flush=True)

def dot_i8(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
def dot_bf(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

for (M, K, N) in [(4096, 4096, 4096), (8192, 8192, 1024), (21504, 4608, 1024)]:
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    g = M * K * N / 1e9
    timed(f"int8 {M}x{K}x{N}", dot_i8, x8, w8, g, 197)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    timed(f"bf16 {M}x{K}x{N}", dot_bf, xb, wb, g, 98.5)

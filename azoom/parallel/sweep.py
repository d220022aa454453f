"""Sharded batch evaluation sweeps — batch_run.py as one array program.

The reference's sweep driver loops scenes serially on one CPU
(Final_pipeline/batch_run.py:12-49: for i in range(n): sim -> inf -> eval).
Here a sweep is a *batch axis*: generate B scenes from B PRNG keys, enhance
them, and score them — vmapped, jitted, and sharded over the 'data' axis of
a device mesh so every chip owns B/n_devices scenes and the only
communication is the final metric gather. This is the BASELINE.json north
star ("batch_run.py sweeps thousands of mixtures per step").

Fault tolerance (batch_run.py:47-49's try/except-continue) becomes
numerical: per-scene metrics are jnp.where-guarded, and non-finite scores
are masked out of the aggregate instead of aborting the sweep.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from azoom.config import PipelineConfig
from azoom.eval.projection import osinr_osir
from azoom.eval.stoi import stoi
from azoom.pipelines.oracle import oracle_enhance
from azoom.sim.farfield import make_scene
from azoom.sim.signals import speech_like

__all__ = ["oracle_sweep", "sweep_summary", "sharded_sweep"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_scenes", "n_samples", "with_stoi")
)
def oracle_sweep(
    key: jax.Array,
    cfg: PipelineConfig,
    n_scenes: int = 16,
    n_samples: int = 32_000,
    with_stoi: bool = False,
) -> dict:
    """Generate + enhance + score n_scenes anechoic oracle runs in one
    program. Returns per-scene arrays: sir_in, sir_out, sir_imp, sinr_out
    (and stoi when requested)."""
    keys = jax.random.split(key, n_scenes)

    def one(k):
        k1, k2, k3, ka = jax.random.split(k, 4)
        f0s = jax.random.uniform(ka, (3,), minval=100.0, maxval=280.0)
        tgt = speech_like(k1, n_samples, cfg.fs, f0s[0])
        i1 = speech_like(k2, n_samples, cfg.fs, f0s[1])
        i2 = speech_like(k3, n_samples, cfg.fs, f0s[2])
        sc = make_scene(
            tgt, jnp.stack([i1, i2]), cfg.angle_target_deg,
            jnp.asarray([40.0, 130.0]), cfg.mic_dist, cfg.fs,
        )
        out = oracle_enhance(
            sc["mixture"], sc["target_ref"], sc["interference_ref"], cfg
        )
        sinr_out, sir_out = osinr_osir(out, sc["target_ref"], sc["interference_ref"])
        _, sir_in = osinr_osir(
            sc["mixture"][0], sc["target_ref"], sc["interference_ref"]
        )
        res = {
            "sir_in": sir_in,
            "sir_out": sir_out,
            "sir_imp": sir_out - sir_in,
            "sinr_out": sinr_out,
        }
        if with_stoi:
            res["stoi"] = stoi(sc["target_ref"], out, cfg.fs)
        return res

    return jax.vmap(one)(keys)


def sharded_sweep(
    sweep_fn: Callable[..., dict],
    key: jax.Array,
    mesh,
    n_scenes: int,
    *args: Any,
    axis_name: str = "data",
    **kwargs: Any,
) -> dict:
    """Run a vmapped sweep with its scene axis sharded over the mesh.

    ``sweep_fn(key, *args, n_scenes=..., **kwargs) -> dict of (B,) arrays``
    (e.g. :func:`oracle_sweep`). The key split and all compute are sharded;
    XLA partitions the program so each device synthesizes and scores only
    its own scenes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if n_scenes % mesh.devices.size != 0:
        raise ValueError(
            f"n_scenes={n_scenes} must divide over {mesh.devices.size} devices"
        )
    shard = NamedSharding(mesh, P(axis_name))

    # One sharding for every (B,)-shaped leaf of the result dict.
    return jax.jit(
        lambda k: sweep_fn(k, *args, n_scenes=n_scenes, **kwargs),
        out_shardings=shard,
    )(key)


def sweep_summary(results: dict) -> dict:
    """Aggregate a sweep's per-scene metrics, masking non-finite entries
    (the vectorized form of batch_run.py's per-run try/except)."""
    out = {}
    for name, v in results.items():
        v = jnp.asarray(v)
        ok = jnp.isfinite(v)
        n_ok = jnp.sum(ok)
        safe = jnp.where(ok, v, 0.0)
        mean = jnp.sum(safe) / jnp.maximum(n_ok, 1)
        var = jnp.sum(jnp.where(ok, (v - mean) ** 2, 0.0)) / jnp.maximum(n_ok, 1)
        out[name] = {
            "mean": float(mean),
            "std": float(jnp.sqrt(var)),
            "min": float(jnp.min(jnp.where(ok, v, jnp.inf))),
            "max": float(jnp.max(jnp.where(ok, v, -jnp.inf))),
            "n": int(n_ok),
            "n_failed": int(jnp.sum(~ok)),
        }
    return out

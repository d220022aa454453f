"""REAL multi-process execution of the multihost layer.

Round-1 review noted azoom.parallel.multihost was only tested through its
single-process no-op path. Here two actual OS processes join one JAX
distributed runtime over a localhost coordinator (2 virtual CPU devices
each -> a 4-device global mesh spanning processes), and the SAME
sharded_sweep used on-device runs with its scene axis split across
processes — the DCN sweep-farming design of SURVEY.md §2.4 executed for
real, not mocked.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "@REPO@")

from azoom.parallel.multihost import (
    global_data_mesh, host_shard, initialize, is_primary,
)

initialize(
    coordinator_address="@COORD@",
    num_processes=2,
    process_id=@PID@,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # global view spans processes

import jax.numpy as jnp
from azoom.config import PipelineConfig
from azoom.parallel.sweep import oracle_sweep, sharded_sweep

mesh = global_data_mesh()
assert mesh.devices.size == 4

cfg = PipelineConfig(mic_dist=0.04)
with mesh:
    res = sharded_sweep(
        oracle_sweep, jax.random.PRNGKey(0), mesh, 4, cfg, n_samples=8_192,
    )
# Global sharded output -> replicated reduction is fetchable everywhere.
mean_imp = float(jax.jit(jnp.mean)(res["sir_imp"]))
assert mean_imp > 15.0, mean_imp

# Host-side work partitioning: the two processes cover [0, 10) disjointly.
shard = host_shard(10)
assert len(shard) == 5
assert (shard.start, shard.stop) == ((0, 5) if is_primary() else (5, 10))

print(f"proc {jax.process_index()}: mean sir_imp {mean_imp:.2f} OK", flush=True)
"""


def test_two_process_distributed_sweep():
    port = socket.socket().getsockname()  # placeholder; pick a real free port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.replace("@REPO@", str(REPO))
                    .replace("@COORD@", coord)
                    .replace("@PID@", str(pid))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=560) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{err[-3000:]}"
    assert "proc 0: mean sir_imp" in outs[0][0]
    assert "proc 1: mean sir_imp" in outs[1][0]

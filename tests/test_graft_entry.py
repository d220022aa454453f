"""Driver entry-point tests: entry() compiles and runs; dryrun_multichip
works on the virtual-device mesh (the driver invokes these externally)."""

import subprocess
import sys
from pathlib import Path

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def test_entry_and_dryrun_subprocess():
    """Run in a subprocess with 8 virtual CPU devices (a fresh process is
    what the driver does; also avoids backend-state contamination)."""
    code = (
        "import __graft_entry__ as g, jax\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert out.shape == (2, 16384) or out.ndim == 1, out.shape\n"
        "print('entry-ok', out.shape)\n"
        "g.dryrun_multichip(8)\n"
    )
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "entry-ok" in r.stdout
    assert "dryrun] 8-device mesh OK" in r.stdout


def test_dryrun_self_provisions_from_single_device():
    """The driver calls dryrun_multichip(8) from a session with ONE device
    (the axon TPU). The function must self-provision a virtual 8-CPU mesh
    in a subprocess rather than assert (round-1 MULTICHIP gate failure)."""
    import os

    code = (
        "import __graft_entry__ as g, jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "g.dryrun_multichip(8)\n"
        "print('self-provision-ok')\n"
    )
    env = dict(os.environ)
    # Parent sees exactly one (CPU) device; no forced device count.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun] 8-device mesh OK" in r.stdout
    assert "self-provision-ok" in r.stdout

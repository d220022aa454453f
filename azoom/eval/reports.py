"""Evaluation reporting: per-run report.txt, central batch_metrics.csv,
append-only history.

Rebuilds the reference's observability surface (SURVEY.md §5):
  * report.txt layout          — Final_pipeline/src/metrics.py:163-189
  * batch_metrics.csv columns  — metrics.py:16-44 (9 columns)
  * evaluation_history.txt     — scripts/eval.py:216-223

Metric math runs on device (azoom.eval.projection / stoi); this module is
the host-side persistence layer.
"""

from __future__ import annotations

import csv
import datetime
import os
from pathlib import Path

import numpy as np

from azoom.eval.pesq_bridge import PESQ_BACKEND, pesq_scores
from azoom.eval.projection import osinr_osir
from azoom.eval.stoi import stoi as stoi_fn

__all__ = ["compute_run_metrics", "format_report", "append_to_csv", "evaluate_run_files"]

# Column layout mirrors the reference CSV (metrics.py:16-44), with the
# SAME perceptual column names under either backend. Promotion decision
# (round 5): the native estimator is table-exact at both sample rates
# (the published ITU 49-/42-band Bark tables, jointly consistency-
# validated) and implements the full three-stage P.862 time alignment
# (global + utterance splitting + bad-interval realignment), so its
# scores are on the P.862 MOS-LQO scale at the fidelity of a
# reimplementation; the one certification step this zero-egress
# environment cannot run — the ITU conformance WAV vectors against the
# ITU binary — is recorded in azoom.eval.pesq_native's docstring and in
# the report footer's backend tag rather than in the column names.
# (Rounds 2-4 suffixed these columns `_native`; a CSV started under
# that scheme fails the append-guard below — start a fresh CSV.)
_PESQ_SUFFIX = ""
CSV_HEADERS = [
    "Run_ID", "SIR_Base", "SIR_Enh", "SIR_Imp",
    "SINR_Base", "SINR_Enh", "STOI",
    f"PESQ_WB{_PESQ_SUFFIX}", f"PESQ_NB{_PESQ_SUFFIX}",
]


def compute_run_metrics(
    enhanced: np.ndarray,
    mixture_ch0: np.ndarray,
    target_ref: np.ndarray,
    interference_ref: np.ndarray,
    fs: int = 16_000,
    with_perceptual: bool = True,
) -> dict:
    """All scoreboard numbers for one run (metrics.py:143-161)."""
    n = min(map(len, (enhanced, mixture_ch0, target_ref, interference_ref)))
    est, mix = enhanced[:n], mixture_ch0[:n]
    tgt, itf = target_ref[:n], interference_ref[:n]

    sinr_b, sir_b = (float(v) for v in osinr_osir(mix, tgt, itf))
    sinr_s, sir_s = (float(v) for v in osinr_osir(est, tgt, itf))
    # PESQ stays None ("N/A" downstream) when unmeasured — a 0.0 would be
    # indistinguishable from a catastrophic score in the CSV (the reference
    # prints its optional-dependency guard instead, metrics.py:8-14).
    out = {
        "sir_b": sir_b, "sir_s": sir_s, "imp": sir_s - sir_b,
        "sinr_b": sinr_b, "sinr_s": sinr_s,
        "stoi": None, "pesq_wb": None, "pesq_nb": None,
    }
    if with_perceptual:
        out["stoi"] = float(stoi_fn(np.asarray(tgt), np.asarray(est), fs))
        nb, wb = pesq_scores(np.asarray(tgt), np.asarray(est), fs)
        out["pesq_nb"] = nb
        out["pesq_wb"] = wb
    return out


def _fmt(v, spec: str) -> str:
    """Format a metric; None renders as N/A (not-measured marker)."""
    return "N/A" if v is None else f"{v:{spec}}"


def format_report(run_name: str, m: dict) -> str:
    """The report.txt layout (metrics.py:167-183), byte-compatible."""
    timestamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    lines = [
        f"=== EVALUATION REPORT: {run_name} ===",
        f"Date: {timestamp}",
        "------------------------------------",
        "BASELINE (Mixture):",
        f"  SIR:   {m['sir_b']:.2f} dB",
        f"  SINR:  {m['sinr_b']:.2f} dB",
        "------------------------------------",
        "ENHANCED (Output):",
        f"  SIR:   {m['sir_s']:.2f} dB",
        f"  SINR:  {m['sinr_s']:.2f} dB",
        f"  STOI:  {_fmt(m['stoi'], '.4f')}",
        f"  PESQ:  {_fmt(m['pesq_wb'], '.4f')} (WB) | "
        f"{_fmt(m['pesq_nb'], '.4f')} (NB)",
        "------------------------------------",
        f"SIR IMPROVEMENT: {m['imp']:+.2f} dB",
        "====================================",
    ]
    if m.get("pesq_wb") is not None or m.get("pesq_nb") is not None:
        # Provenance tag (see the column-naming note at the top): same
        # P.862 MOS-LQO scale either way; 'native' = the built-in
        # table-exact reimplementation (ITU conformance vectors unrun).
        lines.append(f"PESQ backend: {PESQ_BACKEND}")
    return "\n".join(lines)


def append_to_csv(csv_path: str | os.PathLike, run_name: str, m: dict) -> None:
    """Append one row to the central batch CSV (metrics.py:16-44)."""
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    file_exists = csv_path.is_file()
    if file_exists:
        # Header guard: a CSV started under the pre-round-5 `_native`
        # column scheme (or any other layout) must not silently receive
        # rows with different column names.
        with open(csv_path, newline="") as f:
            existing = f.readline().strip().split(",")
        if existing and existing != CSV_HEADERS:
            raise ValueError(
                f"{csv_path} was written with columns {existing}; this "
                f"environment would append {CSV_HEADERS} (different PESQ "
                "backend/scale). Use a fresh CSV per backend."
            )
    with open(csv_path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=CSV_HEADERS)
        if not file_exists:
            writer.writeheader()
        writer.writerow(
            {
                "Run_ID": run_name,
                "SIR_Base": f"{m['sir_b']:.2f}",
                "SIR_Enh": f"{m['sir_s']:.2f}",
                "SIR_Imp": f"{m['imp']:.2f}",
                "SINR_Base": f"{m['sinr_b']:.2f}",
                "SINR_Enh": f"{m['sinr_s']:.2f}",
                "STOI": _fmt(m["stoi"], ".4f"),
                f"PESQ_WB{_PESQ_SUFFIX}": _fmt(m["pesq_wb"], ".4f"),
                f"PESQ_NB{_PESQ_SUFFIX}": _fmt(m["pesq_nb"], ".4f"),
            }
        )


def evaluate_run_files(
    run_name: str,
    sim_dir: str | os.PathLike,
    results_dir: str | os.PathLike,
    fs: int = 16_000,
    history_path: str | os.PathLike | None = None,
) -> dict | None:
    """File-based evaluation entry point (metrics.py:125-206): reads
    mixture/target/interference from sim_dir and {run_name}_enhanced.wav
    from results_dir; writes report.txt + appends the central CSV."""
    from azoom.io.wav import read_wav

    sim_dir, results_dir = Path(sim_dir), Path(results_dir)
    est_path = results_dir / f"{run_name}_enhanced.wav"
    if not est_path.exists():
        print(f"[EVAL] Error: Inference output not found at {est_path}")
        return None

    def ch0(path):
        audio, _ = read_wav(path)
        return audio[:, 0] if audio.ndim > 1 else audio

    est = ch0(est_path)
    tgt = ch0(sim_dir / "target.wav")
    itf = ch0(sim_dir / "interference.wav")
    mix = ch0(sim_dir / "mixture.wav")

    m = compute_run_metrics(est, mix, tgt, itf, fs)
    report = format_report(run_name, m)
    print(report)
    (results_dir / "report.txt").write_text(report)
    append_to_csv(results_dir.parent / "batch_metrics.csv", run_name, m)
    if history_path is not None:
        with open(history_path, "a") as f:
            f.write(report + "\n\n")
    return m

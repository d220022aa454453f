"""One-shot FULL test suite with per-file process isolation.

Very long single-process pytest runs have (rarely) hit an XLA CPU
compiler segfault late in the suite on this host (every file passes in
isolation — the crash correlates with accumulated compiled-program
state, not with any test). This driver makes the full suite a single
reliable command: each test file runs in its own pytest process (fresh
XLA, fresh caches), failures and crashes are contained to their file,
and the run is green iff every file is green.

Run (or `make test-full`):
    python scripts/run_full_suite.py            # fast + slow tiers
    python scripts/run_full_suite.py -m slow    # one tier only
"""
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PER_FILE_TIMEOUT = 1800  # the slowest training-run file needs ~15 min


def main(argv):
    marker = ""
    if "-m" in argv:
        marker = argv[argv.index("-m") + 1]
    files = sorted((REPO / "tests").glob("test_*.py"))
    failed, t_all = [], time.time()
    for i, f in enumerate(files, 1):
        cmd = [sys.executable, "-m", "pytest", str(f), "-q", "-m", marker,
               "--no-header", "-p", "no:cacheprovider"]
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, capture_output=True,
                               text=True, timeout=PER_FILE_TIMEOUT)
        except subprocess.TimeoutExpired:
            print(f"[{i:2d}/{len(files)}] {f.name:42s} TIMEOUT "
                  f"(> {PER_FILE_TIMEOUT}s)", flush=True)
            failed.append((f.name, "timeout"))
            continue
        tail = [ln for ln in (r.stdout or "").strip().splitlines() if ln]
        summary = tail[-1] if tail else "(no output)"
        status = "ok" if r.returncode == 0 else f"RC={r.returncode}"
        # pytest rc 5 = no tests collected for this marker — not a failure
        if r.returncode not in (0, 5):
            failed.append((f.name, summary))
            # keep the failure detail (which test, which assert) — a
            # bare summary line is useless for diagnosing rare flakes
            for ln in tail[-15:]:
                print(f"    | {ln}", flush=True)
        print(f"[{i:2d}/{len(files)}] {f.name:42s} {status:6s} "
              f"{time.time()-t0:6.1f}s  {summary}", flush=True)
    print(f"\n== full suite: {len(files)} files in "
          f"{(time.time()-t_all)/60:.1f} min; "
          f"{len(failed)} failed ==", flush=True)
    for name, why in failed:
        print(f"  FAILED {name}: {why}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

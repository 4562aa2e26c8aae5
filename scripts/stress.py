"""Repeatable degenerate-skew stress protocol (round-7 verdict #8).

Reproduces the round-7 evidence for the one-off ``sessionize_users``
divergence hypothesis with ONE command: run the hot-key / duplicate-
flood oracle tests N consecutive times while CPU+memory-churn spinner
processes run, so retry-nondeterminism under load has N chances to
surface.  Exit 0 iff every run is fully green.

    python scripts/stress.py [--runs 10] [--spinners 12] \
        [-k hot_keys] [--log-dir /tmp]

Each spinner burns CPU and cycles a ~64 MB allocation (the generic-load
contention hypothesis); pass ``--spinners 0`` for an unloaded baseline.
The concurrent-Spark hypothesis from round 7 is reproducible by running
any Spark job (e.g. ``scripts/make_scale_data.py``) alongside this —
the runner itself stays single-purpose.  Per-run pytest logs land in
``<log-dir>/stress_run_<i>.log``.
"""

from __future__ import annotations

import argparse
import multiprocessing
import os
import subprocess
import sys
import time


def _spin() -> None:  # pragma: no cover - child process body
    junk = bytearray(64 * 1024 * 1024)
    x = 0
    while True:
        x = (x * 1103515245 + 12345) % (1 << 31)
        junk[x % len(junk)] = x & 0xFF


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--spinners", type=int, default=12)
    ap.add_argument("-k", default="hot_keys", help="pytest -k expression")
    ap.add_argument("--log-dir", default="/tmp")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spinners = [
        multiprocessing.Process(target=_spin, daemon=True)
        for _ in range(args.spinners)
    ]
    for p in spinners:
        p.start()
    failures = []
    try:
        for i in range(1, args.runs + 1):
            log = os.path.join(args.log_dir, f"stress_run_{i}.log")
            t0 = time.time()
            with open(log, "w") as fh:
                rc = subprocess.run(
                    [sys.executable, "-m", "pytest", "tests/test_degenerate_inputs.py",
                     "-q", "-k", args.k],
                    cwd=repo,
                    stdout=fh,
                    stderr=subprocess.STDOUT,
                ).returncode
            status = "green" if rc == 0 else f"FAILED rc={rc}"
            print(f"run {i}/{args.runs}: {status} in {time.time() - t0:.0f}s ({log})",
                  flush=True)
            if rc != 0:
                failures.append(i)
    finally:
        for p in spinners:
            p.terminate()
    if failures:
        print(f"STRESS FAIL: runs {failures} not green")
        return 1
    print(f"stress ok: {args.runs}/{args.runs} runs green under "
          f"{args.spinners} churn spinners")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

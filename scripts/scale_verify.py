"""Repeatable sf1 live-oracle scale gate (round-8 verdict #6).

The manual protocol that caught the round-8 Arrow-slice ordering bug —
run the newest queries against LIVE DuckDB oracles on a 10x scale-up of
the bench SF — made into one command:

1. builds the scratch sf1 under /tmp (via make_scale_data.py) if any
   table is missing;
2. selects the N most recently REGISTERED oracle-backed queries (the
   code most likely to harbor an at-scale bug; ``--only``/``--all``
   override);
3. delegates the twin-run to verify.py with --sf-dir pointed at the
   scratch dir — identical comparison semantics to the sf0.01 gate
   (sorted columns, row count, 9-sig-digit value normalization, Arrow
   type-kind audit), exits non-zero on any mismatch.

Usage:
  python scripts/scale_verify.py [--newest 10] [--only a,b] [--all]
      [--dst /tmp/spark_graft_scale/sf1] [--src /root/testdata/sf0.1]
      [--copies 10]

Never run concurrently with another Spark-heavy job when timing matters
(and sf10 builds can OOM under contention — see BENCH_DIFF protocol).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SCRIPTS = os.path.dirname(os.path.abspath(__file__))


def ensure_dataset(src: str, dst: str, copies: int) -> None:
    missing = [t for t in TABLES if not os.path.exists(os.path.join(dst, f"{t}.parquet"))]
    if not missing:
        print(f"scale dataset present: {dst}", flush=True)
        return
    print(f"building scale dataset ({copies}x {src} -> {dst}; missing {missing})", flush=True)
    subprocess.run(
        [
            sys.executable,
            os.path.join(SCRIPTS, "make_scale_data.py"),
            "--src",
            src,
            "--dst",
            dst,
            "--copies",
            str(copies),
        ],
        check=True,
    )


def newest_oracle_backed(n: int) -> list[str]:
    """Last *n* registration-order query names that carry an oracle —
    registration order IS recency (the registry is append-only)."""
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    named = [name for name, q in QUERIES.items() if q.oracle is not None]
    return named[-n:]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--newest", type=int, default=10)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--all", action="store_true", help="whole registry (slow)")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    ensure_dataset(args.src, args.dst, args.copies)

    cmd = [
        sys.executable,
        os.path.join(SCRIPTS, "verify.py"),
        "--sf-dir",
        args.dst,
    ]
    if args.only:
        cmd += ["--only", args.only]
    elif not args.all:
        names = newest_oracle_backed(args.newest)
        print(f"newest-{args.newest} oracle-backed queries: {names}", flush=True)
        cmd += ["--only", ",".join(names)]
    rc = subprocess.run(cmd).returncode
    print(("SCALE GATE PASS" if rc == 0 else "SCALE GATE FAIL"), flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())

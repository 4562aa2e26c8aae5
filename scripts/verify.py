"""End-to-end driver-contract verification (.claude/skills/verify recipe).

Fresh-process check of __spark_entry__.py exactly the way the driver
consumes it: plain SparkSession (no repo get_spark), entry() smoke at
sf0.001, then a t2 twin-run of every queries()/oracle_sql() pair against
DuckDB at sf0.01 with order-insensitive, float-normalized comparison.

Usage: python scripts/verify.py [--sf-dir /root/testdata/sf0.01] [--tz Asia/Shanghai]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return float(f"{v:.9g}")
    return v


# --- type-kind audit -------------------------------------------------
# Round-1 lesson: local fetchall() returns Python ints for DuckDB HUGEINT
# (the result type of SUM over integers), so value comparison passed here,
# but the driver's fetch path widened HUGEINT ("123" became "123.0" or a
# Decimal repr) and hash-mismatched two queries whose oracles emitted raw
# integer SUMs.  We therefore also inspect the oracle's Arrow schema — the
# strictest stable view of DuckDB's result types (nullable BIGINT stays
# int64 there; HUGEINT becomes decimal128) — and require each column's
# coarse kind (int / float / decimal / bool / datetime / other) to match
# the Spark output type exactly.  Any mismatch is a driver-hash hazard
# even when the values compare equal locally.

_SPARK_INT = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
_SPARK_FLOAT = {"float", "double"}


def spark_kind(dt: str) -> str:
    d = dt.lower()
    if d in _SPARK_INT:
        return "i"
    if d in _SPARK_FLOAT:
        return "f"
    if d.startswith("decimal"):
        return "d"
    if d == "boolean":
        return "b"
    if d.startswith("timestamp") or d == "date":
        return "M"
    return "O"


def arrow_kind(t) -> str:
    import pyarrow.types as pat

    if pat.is_integer(t):
        return "i"
    if pat.is_floating(t):
        return "f"
    if pat.is_decimal(t):
        return "d"
    if pat.is_boolean(t):
        return "b"
    if pat.is_temporal(t):
        return "M"
    return "O"


def kind_audit(sdf, otable):
    """Return list of (col, spark_kind, oracle_kind) mismatches."""
    skinds = {f.name.lower(): spark_kind(f.dataType.simpleString()) for f in sdf.schema.fields}
    bad = []
    for field in otable.schema:
        ok = arrow_kind(field.type)
        sk = skinds.get(field.name.lower())
        if sk is None:
            continue
        if sk != ok:
            bad.append((field.name, sk, ok))
    return bad


def norm_rows(rows):
    return sorted((tuple(norm_val(v) for v in r) for r in rows), key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--smoke-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--tz", default=None, help="driver session timezone override probe")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    t0 = time.time()
    n = len(E.entry(spark).collect())
    print(f"entry() smoke: {n} rows in {time.time() - t0:.1f}s", flush=True)
    assert n > 0, "entry() returned 0 rows"

    con = duckdb.connect()
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset dir (scratch SFs)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries, oracles = E.queries(), E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    failed, rows_only = [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sorted(c.lower() for c in sdf.columns)
            # ONE collect per query — a heavy Spark plan must not run
            # twice just to reorder columns
            raw_srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}", flush=True)
            continue
        if name not in oracles:
            rows_only.append((name, len(raw_srows)))
            print(f"  ok(rows-only) {name}: {len(raw_srows)} rows {time.time()-t0:.1f}s", flush=True)
            continue
        try:
            # ONE oracle execution for values — a 20 s recursive-CTE
            # closure must not run three times (values, sorted values,
            # Arrow schema); the Arrow kind audit below re-executes only
            # after everything else matches
            cur = con.execute(oracles[name])
            odesc = [c for c, *_ in cur.description]
            ocols = sorted(c.lower() for c in odesc)
            raw_orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"oracle error: {exc}"))
            print(f"FAIL {name}: oracle error: {exc}", flush=True)
            continue
        # compare with columns sorted by name (driver semantics)
        sidx = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(sdf.columns))]
        oidx = [i for _, i in sorted((c.lower(), i) for i, c in enumerate(odesc))]
        s_sorted = norm_rows(tuple(r[i] for i in sidx) for r in raw_srows)
        o_sorted = norm_rows(tuple(r[i] for i in oidx) for r in raw_orows)
        if scols != ocols:
            failed.append((name, f"schema mismatch: spark={scols} oracle={ocols}"))
            print(f"FAIL {name}: schema mismatch\n  spark={scols}\n  duck ={ocols}", flush=True)
        elif len(s_sorted) != len(o_sorted):
            failed.append((name, f"rowcount {len(s_sorted)} vs {len(o_sorted)}"))
            print(f"FAIL {name}: rowcount {len(s_sorted)} vs {len(o_sorted)}", flush=True)
        elif s_sorted != o_sorted:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, o_sorted)) if a != b
            )
            failed.append((name, f"value mismatch at sorted row {diff[0]}"))
            print(
                f"FAIL {name}: value mismatch at sorted row {diff[0]}\n"
                f"  spark={diff[1]}\n  duck ={diff[2]}",
                flush=True,
            )
        else:
            # LIMIT 0 binds the result schema without re-executing the
            # plan (0.01 s vs a full second run of a recursive-CTE
            # oracle); Arrow types are identical to the executed run's
            bad = kind_audit(
                sdf,
                con.execute(f"SELECT * FROM ({oracles[name]}) __kind_probe LIMIT 0").arrow(),
            )
            if bad:
                failed.append((name, f"type-kind mismatch (driver-hash hazard): {bad}"))
                print(f"FAIL {name}: type-kind mismatch {bad}", flush=True)
            else:
                print(f"  ok {name}: {len(s_sorted)} rows {time.time()-t0:.1f}s", flush=True)

    # ---- closing gate: PLANS.md must cover the current registry -----
    # (round-4 verdict "What's wrong" #3: the audit lagged the registry;
    # verify now fails when a query is missing from — or stale in —
    # PLANS.md, so `python scripts/plan_audit.py` must be re-run after
    # registry changes.)
    if only is None:
        plans_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
        )
        plans_gate = None
        try:
            import re as _re

            with open(plans_path) as f:
                listed = set(_re.findall(r"^\| (\w+) \|", f.read(), _re.M))
            missing = sorted(set(queries) - listed)
            extra = sorted(listed - set(queries) - {"query"})
            if missing or extra:
                plans_gate = f"PLANS.md stale: missing={missing} removed={extra}"
        except OSError as exc:
            plans_gate = f"PLANS.md unreadable: {exc}"
        if plans_gate:
            failed.append(("PLANS.md", plans_gate))
            print(f"FAIL PLANS.md gate: {plans_gate}", flush=True)
        else:
            print(f"  ok PLANS.md gate: {len(queries)} queries audited", flush=True)

    print(
        f"\n{len(queries) - len(failed)}/{len(queries)} ok "
        f"({len(rows_only)} rows-only, {len(failed)} FAILED)",
        flush=True,
    )
    for name, why in failed:
        print(f"  FAILED {name}: {why}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

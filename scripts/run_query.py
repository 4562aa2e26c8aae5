"""Run any registered query by name against a testdata scale factor.

Usage:
  python scripts/run_query.py hot_items_topn [--sf-dir /root/testdata/sf0.01]
                              [--show 20] [--explain] [--oracle]
  python scripts/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the formatted physical plan")
    ap.add_argument("--oracle", action="store_true", help="also run the DuckDB oracle SQL")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    if args.list or not args.name:
        for n, qd in QUERIES.items():
            tag = "" if qd.oracle else "  [rows-only]"
            print(f"{n}{tag}\n    {qd.doc}")
        return 0

    qd = QUERIES[args.name]
    from flinkecuserbehavioranalysis_spark.session import get_spark

    spark = get_spark("run-query", shuffle_partitions=8)
    df = qd.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    print(f"rows: {df.count()}")

    if args.oracle and qd.oracle:
        import duckdb

        con = duckdb.connect()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            path = os.path.join(args.sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        res = con.execute(qd.oracle)
        print("oracle columns:", [c for c, *_ in res.description])
        print("oracle rows:", len(res.fetchall()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

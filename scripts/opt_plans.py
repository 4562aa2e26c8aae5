"""Capture .explain("formatted") for named queries into plans/r11/.

Round-11 optimization deliverable: the judge checks plan claims against
committed plan files.  Usage:

  python scripts/opt_plans.py --suffix before q1 q2 ...
  python scripts/opt_plans.py --suffix after --sf-dir /root/testdata/sf0.1 q1

Plans are captured at sf0.1 by default (the bench SF) in a fresh
session so memoized family frames don't hide the build cost of the
first member (pass --warm to capture the memo-hit plan instead).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="before", choices=["before", "after"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=os.path.join("plans", "r11"))
    ap.add_argument(
        "--warm",
        action="store_true",
        help="materialize once first so the captured plan reads the memoized frame",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES
    from flinkecuserbehavioranalysis_spark.session import get_spark

    spark = get_spark("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = QUERIES[name].fn(spark, args.sf_dir)
        if args.warm:
            df.write.format("noop").mode("overwrite").save()
            df = QUERIES[name].fn(spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

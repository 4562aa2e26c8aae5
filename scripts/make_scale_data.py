"""Synthesize a scratch N-times scale-up of a driver testdata dir.

Round-4 verdict ask #1: the 100 TB posture rested on plan shapes plus
sf0.01→sf0.1 slopes; nothing validated behavior at even 10× the bench
SF.  This script builds that dataset — OUTSIDE the read-only driver
dirs — by union-with-offset-keys over the sf0.1 tables, preserving
per-key history sizes and value distributions while scaling row counts:

- fact/dim keys shift by copy_index × (max_key + 1) per table, with
  foreign keys shifted consistently (orders.o_custkey follows customer,
  lineitem.l_orderkey/l_partkey/l_suppkey follow their parents), so
  referential integrity and join fan-outs survive the scale-up;
- events.user_id shifts per copy: 10× users with the same per-user
  history length — horizontal growth, the realistic cluster shape;
- documents.text for copy i>0 prefixes every token with ``c<i>`` —
  within-copy near-dup structure is copied exactly (shingle sets are
  isomorphic) while cross-copy Jaccard is 0, so the LSH pair count
  scales ×N instead of exploding quadratically with artificial
  cross-copy duplicates; vocabulary grows ×N (stressing the vocab
  auto-shard);
- embeddings for copy i>0 get a deterministic per-dim jitter
  (0.001·i·sin(vec_id + dim)) so ANN neighborhoods are copied but not
  degenerate-identical;
- region/nation copy through unchanged (dimensions).

Copy 0 is bit-identical to the source, so the scale-up strictly
contains the bench SF.

Usage:
  python scripts/make_scale_data.py [--src /root/testdata/sf0.1]
      [--dst /tmp/spark_graft_scale/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _max_key(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def _shift(df: DataFrame, i: int, offsets: dict[str, int]) -> DataFrame:
    out = df
    for c, base in offsets.items():
        out = out.withColumn(c, (F.col(c) + F.lit(i * base)).cast("long"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.session import get_spark

    spark = get_spark("make_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    src = {
        t: load_table(spark, args.src, t)
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    C = _max_key(src["customer"], "c_custkey")
    S = _max_key(src["supplier"], "s_suppkey")
    P = _max_key(src["part"], "p_partkey")
    O = _max_key(src["orders"], "o_orderkey")
    E = _max_key(src["events"], "event_id")
    U = _max_key(src["events"], "user_id")
    D = _max_key(src["documents"], "doc_id")
    V = _max_key(src["embeddings"], "vec_id")

    def copies(t: str, build) -> None:
        parts = [build(src[t], i) for i in range(args.copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = os.path.join(args.dst, f"{t}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"  {t}: {args.copies}x written")

    for t in ("region", "nation"):
        src[t].write.mode("overwrite").parquet(os.path.join(args.dst, f"{t}.parquet"))
        print(f"  {t}: copied")

    copies("customer", lambda df, i: _shift(df, i, {"c_custkey": C}))
    copies("supplier", lambda df, i: _shift(df, i, {"s_suppkey": S}))
    copies("part", lambda df, i: _shift(df, i, {"p_partkey": P}))
    copies("orders", lambda df, i: _shift(df, i, {"o_orderkey": O, "o_custkey": C}))
    copies(
        "lineitem",
        lambda df, i: _shift(
            df, i, {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}
        ),
    )
    copies("events", lambda df, i: _shift(df, i, {"event_id": E, "user_id": U}))

    def doc_copy(df: DataFrame, i: int) -> DataFrame:
        out = _shift(df, i, {"doc_id": D})
        if i == 0:
            return out
        pfx = F.lit(f"c{i}")
        return out.withColumn(
            "text",
            F.array_join(
                F.transform(F.split(F.col("text"), " "), lambda w: F.concat(pfx, w)),
                " ",
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))

    copies("documents", doc_copy)

    def emb_copy(df: DataFrame, i: int) -> DataFrame:
        out = _shift(df, i, {"vec_id": V})
        if i == 0:
            return out
        jit = F.lit(0.001 * i)
        return out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (x + jit * F.sin(F.col("vec_id") + j)).cast("float"),
            ),
        )

    copies("embeddings", emb_copy)
    print(f"done: {args.dst} ({args.copies}x {args.src})")


if __name__ == "__main__":
    main()

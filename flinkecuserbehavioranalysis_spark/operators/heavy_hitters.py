"""Exact heavy hitters in two passes with bounded memory (extension —
scale utility; no reference analog, the reference's per-key counts
always shuffle the full key set).

The shape that matters at 100 TB: a plain ``groupBy(key).count()``
shuffles EVERY distinct key; when only the items above a frequency
threshold are wanted (hot users, hot items, abusive IPs — the inputs
to every salting decision), the full-cardinality shuffle is waste.
The classic fix (Misra–Gries '82; mergeable-summaries form of Agarwal
et al., PODS'12) is:

1. **candidates** — each partition keeps an O(k) Misra–Gries summary
   (map-only, no shuffle).  Merge step per Arrow batch: add the
   batch's exact counts, then if more than *k* keys remain, subtract
   the (k+1)-th largest count from all and drop the non-positive —
   the standard mergeable-summary decrement.  GUARANTEE: any key with
   global frequency > N/k survives in at least one partition's
   summary — if key f had freq_p ≤ decrement-loss ≤ n_p/k in every
   partition, summing gives freq ≤ N/k, a contradiction (averaging
   pigeonhole).  The union of summaries is therefore a SUPERSET of
   the true θ-heavy hitters for any θ ≥ 1/k.
2. **exact recount** — semi-join the fact table on the (≤ k ×
   n_partitions, broadcastable) candidate set and count exactly; only
   candidate-keyed rows shuffle.  Output counts are EXACT, so the
   whole operator is oracle-checkable against the plain
   GROUP BY ... HAVING formulation — approximation lives only in the
   pruning pass, never in the answer.

NULL keys join no frequency contract (engine NULL-group semantics
differ from the candidate join's) and are excluded on both sides,
including from the denominator N.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(acc: dict, counts: dict, k: int) -> dict:
    """Merge exact-or-MG *counts* into MG summary *acc* and prune to at
    most *k* keys (subtract the (k+1)-th largest, drop non-positive) —
    the mergeable-summaries step; error bounds add across any merge
    tree (Agarwal et al., PODS'12)."""
    for key, cnt in counts.items():
        acc[key] = acc.get(key, 0) + int(cnt)
    if len(acc) > k:
        cut = sorted(acc.values(), reverse=True)[k]
        acc = {x: c - cut for x, c in acc.items() if c - cut > 0}
    return acc


def mg_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries as (key_col, mg_cnt) rows —
    at most *k* per partition, O(k) memory per task regardless of key
    cardinality.  ``mg_cnt`` underestimates the partition-true count by
    at most n_partition/k (the MG error bound)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for b in batches:
            acc = mg_merge(acc, b[key_col].value_counts().to_dict(), k)
        yield pd.DataFrame(
            {key_col: list(acc.keys()), "mg_cnt": list(acc.values())}
        )

    keyed = df.select(key_col).filter(F.col(key_col).isNotNull())
    out_schema = f"{keyed.schema[key_col].dataType.simpleString()}"
    return keyed.mapInPandas(
        summarize, schema=f"{key_col} {out_schema}, mg_cnt long"
    )


def mg_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries candidate keys (single column
    *key_col*, deduplicated across partitions)."""
    return mg_summaries(df, key_col, k).select(key_col).distinct()


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    threshold: float,
    k: int | None = None,
    count_name: str = "cnt",
) -> DataFrame:
    """Keys whose frequency exceeds *threshold* × N (N = non-null-key
    row count), with EXACT counts — two-pass candidate/verify.  *k*
    defaults to ceil(2/threshold), comfortably above the 1/threshold
    superset bound."""
    if not 0 < threshold < 1:
        raise ValueError("heavy_hitters_exact: threshold must be in (0, 1)")
    k = k if k is not None else math.ceil(2.0 / threshold)
    keyed = df.filter(F.col(key_col).isNotNull())
    cand = mg_candidates(df, key_col, k)
    total = keyed.select(F.count(F.lit(1)).alias("__n"))
    return (
        keyed.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias(count_name))
        .crossJoin(F.broadcast(total))
        .filter(F.col(count_name) > F.lit(threshold) * F.col("__n"))
        .drop("__n")
    )

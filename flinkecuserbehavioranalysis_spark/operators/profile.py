"""Single-pass table profiling — the ANALYZE/data-quality primitive a
training-data pipeline runs before trusting a new drop of parquet
(null rates, cardinalities, ranges per column).

Extension beyond the reference (its jobs assume clean fixtures); shape
matters at scale: ONE aggregation pass computes every column's
metrics, then a 1-row ``stack`` unpivots driver-side-free into one row
per column — never k passes for k columns."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    exact_distinct: bool = True,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str) — numeric columns fill the
    ``_num`` bounds (cast to double), string columns the ``_str``
    bounds, the other pair is NULL.

    *exact_distinct* uses ``count(DISTINCT)`` (k distinct aggregates in
    one pass costs one Expand ×k over the scan — exact, engine-
    comparable); at 100 TB flip it off for HLL++ ``approx_count_
    distinct`` (single pass, mergeable, ±rsd).  Either way there is
    exactly one shuffle: the global aggregate's partial/final pair."""
    cols = [*numeric_cols, *string_cols]
    if not cols:
        raise ValueError("profile_table needs at least one column")
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c, rsd))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.min(F.col(c)).alias(f"__sn_{c}"),
            F.max(F.col(c)).alias(f"__sx_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        is_num = c in numeric_cols
        mn = f"__mn_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"__mx_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        sn = f"__sn_{c}" if not is_num else "CAST(NULL AS STRING)"
        sx = f"__sx_{c}" if not is_num else "CAST(NULL AS STRING)"
        parts.append(f"'{c}', __nn_{c}, __nd_{c}, {mn}, {mx}, {sn}, {sx}")
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return row.selectExpr("__rows AS n_rows", stack).select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )

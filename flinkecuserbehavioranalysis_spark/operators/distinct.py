"""Windowed distinct counts — exact and approximate (SURVEY.md §2.3 A5-A7).

Reference semantics reproduced:

- exact per-window UV: ``UvCountByWindow`` buffers *all* userIds of an
  hour into a ``Set`` (NetworkFlowAnalysis/UniqueVisitor.scala:52-66) —
  here ``count_distinct`` whose partial aggregation dedups map-side, so
  state is O(distinct) *per partition* and merges across executors (the
  reference's single Set is a single-node memory bomb at 1e8 users);
- approximate UV: the reference carries a guava bloom filter accumulator
  whose ``merge`` is literally unimplemented
  (UvByBloomFilterWithoutRedis.scala:77 ``???``) and a Redis-bitmap
  variant with a hand-rolled hash (UvWithBloomFilter.scala:93-143) —
  here ``approx_count_distinct`` (HyperLogLog++): mergeable, fixed-size
  sketch, no external store.  Designed-for cardinality 1e8/hour
  (UvByBloomFilterWithoutRedis.scala:20) fits in a ~KB sketch per window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_distinct_count(
    df: DataFrame,
    ts_col: str,
    size: str,
    distinct_col: str,
    slide: str | None = None,
    keys: Sequence[str] = (),
    approx: bool = False,
    rsd: float = 0.01,
    count_alias: str = "uv",
) -> DataFrame:
    win = F.window(F.col(ts_col), size, slide) if slide else F.window(F.col(ts_col), size)
    agg = (
        F.approx_count_distinct(distinct_col, rsd) if approx else F.count_distinct(F.col(distinct_col))
    ).alias(count_alias)
    return (
        df.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(agg)
        .select(
            F.col("w.start").cast("long").alias("ws"),
            F.col("w.end").cast("long").alias("we"),
            *[F.col(k) for k in keys],
            F.col(count_alias),
        )
    )

"""Generated streaming source (SURVEY.md §2.1 S3).

The reference implements ``SimulateEventSource`` as a
``RichParallelSourceFunction`` emitting random ``MarketingUserBehavior``
rows with a 10 µs sleep per row (MarketAnalysis/AppMarketingByChannel.scala:34-75,
AppMarketingStatistics.scala:58-98).  Spark-first: the built-in ``rate``
source provides the unbounded tick stream (per-partition, back-pressure
aware — no sleep throttles), and the random columns are synthesized with
Catalyst expressions, so generation scales with partitions instead of a
single source thread.  Picks are hash-derived from the tick value, so
bounded replays are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CHANNELS = ("AppStore", "XiaomiStore", "HuaweiStore", "weibo", "wechat", "tieba")
BEHAVIORS = ("BROWSE", "CLICK", "PURCHASE", "UNINSTALL")


def _hash_pick(values: tuple[str, ...], seed: int) -> Column:
    """Uniform deterministic pick indexed by xxhash64(tick, seed)."""
    arr = F.array(*[F.lit(v) for v in values])
    idx = (F.pmod(F.abs(F.xxhash64(F.col("value"), F.lit(seed))), F.lit(len(values))) + 1).cast("int")
    return F.element_at(arr, idx)


def marketing_behavior_stream(
    spark: SparkSession, rows_per_second: int = 10_000, partitions: int = 4
) -> DataFrame:
    """Unbounded ``MarketingUserBehavior`` stream: (user_id, behavior,
    channel, ts)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )
    return rate.select(
        F.sha1(F.col("value").cast("string")).alias("user_id"),  # UUID analog, deterministic
        _hash_pick(BEHAVIORS, 1).alias("behavior"),
        _hash_pick(CHANNELS, 2).alias("channel"),
        F.col("timestamp").alias("ts"),
    )

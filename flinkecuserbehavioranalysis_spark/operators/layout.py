"""Data-layout operators — the write-side half of scan performance.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is decided when the data is WRITTEN: a table clustered on the
columns its readers filter by lets parquet row-group statistics and
partition pruning skip almost everything.  Three layout passes:

- :func:`clustered_write` — range-partition on the cluster columns +
  sort within partitions, then write parquet.  Every file then covers a
  narrow key range, so min/max row-group stats turn an equality or
  range filter into file skipping (verified in tests by counting
  ``input_file_name()`` distinct values under a filter).
- :func:`partitioned_write` — hive-style ``partitionBy`` directories
  for low-cardinality keys; Spark prunes partitions at PLANNING time
  (``PartitionFilters`` in the scan node, asserted in tests).
- :func:`compact_small_files` — the small-file compaction pass a
  streaming sink needs periodically: coalesce a directory of tiny
  files into ``target_files`` sorted outputs (same clustering
  contract as :func:`clustered_write`).

``files_touched`` is the measurement half: how many physical files a
filtered read actually opens — the metric every layout decision should
be judged by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 16,
    order_cols: list[str] | None = None,
) -> None:
    """Write *df* as *n_files* parquet files range-clustered on
    *cluster_cols* (and sorted within each file by *order_cols*,
    default the cluster columns) — the layout that makes row-group
    min/max statistics selective for any filter on a prefix of the
    cluster key."""
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*(order_cols or cluster_cols))
        .write.mode("overwrite")
        .parquet(path)
    )


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    n_files_per_partition: int = 1,
) -> None:
    """Hive-style directory partitioning for low-cardinality keys —
    readers filtering on *partition_cols* prune whole directories at
    planning time.  Repartitions on the partition columns first so each
    directory gets *n_files_per_partition* files instead of one shard
    per upstream task (the classic small-file explosion)."""
    cols = [F.col(c) for c in partition_cols]
    # One shuffle keyed on (partition columns, salt): hash partitioning
    # sends each (value, salt) combination to exactly one task, so every
    # directory gets n_files_per_partition files and distinct values
    # still spread across the cluster.  (A bare repartition(n, *cols)
    # could NOT do this: each value hashes to one task regardless of n,
    # and n=1 would serialize the whole write through a single task.)
    if "__salt" in df.columns:
        raise ValueError("partitioned_write: input must not carry a __salt column")
    # Deterministic salt (local sort + hash + position) — reproducible
    # across task retries (SPARK-23207), yet full-duplicate rows still
    # spread across the per-partition files.
    from .skew import attach_deterministic_salt

    (
        attach_deterministic_salt(df, max(n_files_per_partition, 1))
        .repartition(*cols, F.col("__salt"))
        .drop("__salt")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cluster_cols: list[str],
    target_files: int = 8,
) -> None:
    """Read a (typically streaming-sink) directory of many small files
    and rewrite it as *target_files* clustered files — run periodically
    so the read side keeps its pruning and open-file costs bounded."""
    clustered_write(
        spark.read.parquet(src_path), dst_path, cluster_cols, n_files=target_files
    )


def files_touched(df: DataFrame, predicate: Column) -> int:
    """How many physical parquet files a filtered scan reads — the
    layout-quality metric.  ``input_file_name()`` is evaluated per
    surviving row, so files whose row groups are entirely skipped by
    statistics (or whose directories are partition-pruned) never
    appear."""
    return (
        df.filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def _morton(a: Column, b: Column, bits: int) -> Column:
    """Interleave the low *bits* bits of two non-negative long columns
    into a Morton (Z-order) code — pure bit arithmetic, JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Two-dimensional Z-order clustering: bucket each numeric column
    to *bits* bits over its observed [min, max], interleave the bits
    into a Morton code, then range-partition + sort on that code.

    Linear clustering on one column makes filters on THAT column prune
    and filters on the other touch everything; the Z-curve keeps both
    dimensions locally contiguous, so range filters on EITHER column
    skip most files (the lakehouse OPTIMIZE ZORDER BY story, done with
    plain column expressions).  Eager to the extent of one 4-value
    min/max driver aggregate for the bucket scaling."""
    lo_a, hi_a, lo_b, hi_b = (
        df.agg(
            F.min(col_a).cast("double"),
            F.max(col_a).cast("double"),
            F.min(col_b).cast("double"),
            F.max(col_b).cast("double"),
        ).first()
    )
    if lo_a is None or lo_b is None:  # empty (or all-null) input
        df.write.mode("overwrite").parquet(path)
        return
    top = float((1 << bits) - 1)

    def bucket(c: str, lo: float, hi: float) -> Column:
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top)
        return F.least(F.lit(top), F.greatest(F.lit(0.0), scaled)).cast("long")

    z = _morton(bucket(col_a, lo_a, hi_a), bucket(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


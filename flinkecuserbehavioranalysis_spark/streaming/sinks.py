"""External-store sink pattern (SURVEY.md §2.1 S6).

The reference pushes per-window UV counts into Redis with per-element
``hget/hset`` round-trips (UvWithBloomFilter.scala:112,121-136) — an RPC
per record.  The Spark-native shape is ``foreachBatch`` + bulk upsert:
each micro-batch merges into the store once, keyed, idempotent under
replay (micro-batch reprocessing overwrites the same keys).  Here the
"store" is a parquet key-value directory; swapping in Redis/JDBC/Delta
changes only ``_merge``.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_store(spark, target_dir: str) -> DataFrame | None:
    if not os.path.exists(target_dir) or not os.listdir(target_dir):
        return None
    return spark.read.parquet(target_dir)


def foreach_batch_upsert(
    target_dir: str, key_cols: Sequence[str]
) -> Callable[[DataFrame, int], None]:
    """Returns a foreachBatch fn that upserts each batch into
    *target_dir* by *key_cols* (new batch wins — the reference's
    ``hset`` overwrite semantics)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        existing = read_store(spark, target_dir)
        incoming = batch_df.withColumn("__v", F.lit(1))
        if existing is not None:
            merged = existing.withColumn("__v", F.lit(0)).unionByName(incoming)
        else:
            merged = incoming
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.col("__v").desc())
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__v")
        )
        # two-phase write: parquet overwrite of the store directory
        tmp = target_dir.rstrip("/") + ".staging"
        latest.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_dir)

    return process

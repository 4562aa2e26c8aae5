"""Kafka connector surface (SURVEY.md §2.1 S4).

The reference *declares* the Flink Kafka connector but no job
instantiates it (pom.xml:28-37) — there is no behavior to reproduce, so
this module only exposes the Spark-native equivalent wiring.  It
requires the ``spark-sql-kafka-0-10`` package on the classpath and a
reachable broker; neither exists in the test environment, so nothing
here is exercised by tests (mirroring the reference's own unused
dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
    ts_col: str = "ts",
    starting_offsets: str = "latest",
) -> DataFrame:
    """CSV-over-Kafka stream reader matching the reference's would-be
    usage (string messages parsed into a typed record)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_csv(F.col("value").cast("string"), schema.simpleString()).alias("r")
    ).select("r.*")
    if ts_col in parsed.columns:
        parsed = parsed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return parsed


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, checkpoint_dir: str
):
    """Streaming sink: JSON-encoded rows to a topic."""
    return (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )

"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the engine's query
registry (flinkecuserbehavioranalysis_spark/plans/queries.py) — one entry
per implemented operator family from SURVEY.md §2 plus the training-data
pipeline extensions.  Queries without a SQL-expressible twin (HLL
sketches, stateful streaming, Pandas-UDF plumbing) omit the oracle and
get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (HotItems top-N per sliding window) on sf0.001."""
    return QUERIES["hot_items_topn"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}

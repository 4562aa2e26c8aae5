"""operators/layout.py — clustered / partitioned writes must make
filtered scans cheaper in MEASURABLE ways: fewer files touched
(row-group statistics skipping) and PartitionFilters in the plan
(directory pruning), with the data itself intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from flinkecuserbehavioranalysis_spark.io import load_table
from flinkecuserbehavioranalysis_spark.operators.layout import (
    clustered_write,
    compact_small_files,
    files_touched,
    partitioned_write,
)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_clustered_write_skips_files_on_cluster_key(spark, docs, tmp_path):
    path = str(tmp_path / "clustered")
    clustered_write(docs, path, ["lang", "doc_id"], n_files=8)
    back = spark.read.parquet(path)
    # correctness: nothing lost or duplicated
    assert back.count() == docs.count()
    assert back.agg(F.sum("doc_id")).first()[0] == docs.agg(F.sum("doc_id")).first()[0]
    # layout: one lang lives in a narrow range of files; the filter must
    # touch strictly fewer files than the total written
    total = files_touched(back, F.lit(True))
    one_lang = files_touched(back, F.col("lang") == "fr")
    assert total > 1
    assert one_lang < total


def test_clustered_write_pushes_filters(spark, docs, tmp_path):
    path = str(tmp_path / "clustered_pf")
    clustered_write(docs, path, ["lang"], n_files=4)
    plan = (
        spark.read.parquet(path)
        .filter(F.col("lang") == "de")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,de)" in plan


def test_partitioned_write_prunes_at_planning_time(spark, docs, tmp_path):
    path = str(tmp_path / "parted")
    partitioned_write(docs, path, ["lang"])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    filtered = back.filter(F.col("lang") == "en")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # pruned read touches only the en/ directory's files
    assert all("lang=en" in r.f for r in
               filtered.select(F.input_file_name().alias("f")).distinct().collect())
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()


def test_compact_small_files_preserves_rows_and_bounds_files(spark, docs, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    # simulate a streaming sink's small-file spray: 37 shards
    docs.repartition(37).write.mode("overwrite").parquet(src)
    sprayed = files_touched(spark.read.parquet(src), F.lit(True))
    assert sprayed >= 30
    compact_small_files(spark, src, dst, ["lang", "doc_id"], target_files=4)
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert files_touched(back, F.lit(True)) <= 4

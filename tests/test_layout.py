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


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    from flinkecuserbehavioranalysis_spark.operators.layout import zorder_write

    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    linear, zpath = str(tmp_path / "linear"), str(tmp_path / "zorder")
    clustered_write(ev, linear, ["user_id"], n_files=16)
    zorder_write(ev, zpath, "user_id", "value", n_files=16)

    lin, zo = spark.read.parquet(linear), spark.read.parquet(zpath)
    assert zo.count() == ev.count()
    n_lin, n_zo = files_touched(lin, F.lit(True)), files_touched(zo, F.lit(True))

    lo_u, hi_u = 100, 120
    lo_v = ev.approxQuantile("value", [0.45], 0.01)[0]
    hi_v = ev.approxQuantile("value", [0.55], 0.01)[0]
    u_pred = (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
    v_pred = (F.col("value") >= lo_v) & (F.col("value") <= hi_v)

    # linear layout: user filter prunes, value filter reads ~everything
    assert files_touched(lin, u_pred) < n_lin
    assert files_touched(lin, v_pred) >= n_lin - 1
    # z-order: BOTH filters skip files
    assert files_touched(zo, u_pred) < n_zo
    assert files_touched(zo, v_pred) < n_zo
    # and the filtered rows are identical to the source
    assert zo.filter(v_pred).count() == ev.filter(v_pred).count()
    assert zo.filter(u_pred).count() == ev.filter(u_pred).count()


def test_zorder_write_empty_input(spark, tmp_path):
    from flinkecuserbehavioranalysis_spark.operators.layout import zorder_write

    ev = load_table(spark, SF_DIR, "events").select("user_id", "value").filter(F.lit(False))
    path = str(tmp_path / "zempty")
    zorder_write(ev, path, "user_id", "value")
    assert spark.read.parquet(path).count() == 0


def test_partitioned_write_files_per_partition_bounded(spark, docs, tmp_path):
    """n_files_per_partition=k salts each value across k writer tasks:
    every directory gets between 1 and k files (salt collisions inside
    one task can merge, never exceed), and rows survive exactly."""
    import collections

    path = str(tmp_path / "parted_k")
    # AQE would coalesce this tiny shuffle into one task and merge all
    # salts — disable it here; at real scale the partitions stay wide
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        partitioned_write(docs, path, ["lang"], n_files_per_partition=3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    per_dir = collections.Counter(
        r.f.rsplit("/", 2)[1]
        for r in back.select(F.input_file_name().alias("f")).distinct().collect()
    )
    assert per_dir and all(1 <= n <= 3 for n in per_dir.values())
    assert any(n > 1 for n in per_dir.values())


def test_morton_interleave_matches_python_reference(spark):
    """_morton must be the exact bit-interleave (bijective on the
    bits-bounded grid) — checked cell-by-cell against a Python
    reference on an 8-bit grid sample."""
    from flinkecuserbehavioranalysis_spark.operators.layout import _morton

    def ref(a, b, bits):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", _morton(F.col("a"), F.col("b"), 8).alias("z")
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    assert got == {(a, b): ref(a, b, 8) for a, b in rows}
    assert len(set(got.values())) == len(got)  # bijective on the grid


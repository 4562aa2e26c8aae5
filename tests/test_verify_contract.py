"""Guards for the driver-contract comparison itself (scripts/verify.py).

Round-1 postmortem: two queries passed local fetchall() comparison but
hash-mismatched in the driver because DuckDB returns HUGEINT for SUM
over integers, and the driver's fetch path widens HUGEINT while
nullable BIGINT survives.  verify.py now audits the oracle's Arrow
schema against Spark's output types; these tests pin that audit."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from verify import arrow_kind, kind_audit, spark_kind  # noqa: E402


def test_hugeint_sum_flags_against_spark_long(spark):
    """Un-cast SUM(int) in an oracle (HUGEINT → arrow decimal128) must
    flag against a Spark LongType column — the exact round-1 failure."""
    sdf = spark.createDataFrame([(1, 3)], "k long, total long")
    con = duckdb.connect()
    bad = con.execute(
        "SELECT 1::BIGINT AS k, sum(x) AS total FROM (VALUES (1::BIGINT),(2::BIGINT)) t(x)"
    ).arrow()
    assert kind_audit(sdf, bad) == [("total", "i", "d")]
    good = con.execute(
        "SELECT 1::BIGINT AS k, CAST(sum(x) AS BIGINT) AS total "
        "FROM (VALUES (1::BIGINT),(2::BIGINT)) t(x)"
    ).arrow()
    assert kind_audit(sdf, good) == []


def test_nullable_bigint_does_not_flag(spark):
    """Nullable BIGINT stays int64 in Arrow (unlike a pandas fetch) —
    it passed the driver in round 1 and must not false-positive here."""
    sdf = spark.createDataFrame([(1, None)], "k long, v long")
    con = duckdb.connect()
    t = con.execute(
        "SELECT k, v FROM (VALUES (1::BIGINT, NULL::BIGINT), (2::BIGINT, 5::BIGINT)) t(k, v)"
    ).arrow()
    assert kind_audit(sdf, t) == []


def test_kind_mapping_covers_the_common_types(spark):
    assert spark_kind("bigint") == "i" == spark_kind("int")
    assert spark_kind("double") == "f"
    assert spark_kind("decimal(18,2)") == "d"
    assert spark_kind("timestamp_ntz") == "M" == spark_kind("date")
    assert spark_kind("string") == "O" == spark_kind("array<double>")
    con = duckdb.connect()
    t = con.execute(
        "SELECT 1::BIGINT a, 1.5::DOUBLE b, 1.50::DECIMAL(18,2) c, "
        "TIMESTAMP '2024-01-01' d, 'x' e, TRUE f"
    ).arrow()
    kinds = [arrow_kind(field.type) for field in t.schema]
    assert kinds == ["i", "f", "d", "M", "O", "b"]

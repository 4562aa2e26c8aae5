"""Every registered query with a SQL oracle must match DuckDB exactly
(the driver's t2 correctness gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

from conftest import assert_matches_oracle

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    assert_matches_oracle(spark, ddb, QUERIES[name])


def test_registry_nonempty():
    assert len(QUERIES) >= 10


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())

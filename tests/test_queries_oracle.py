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


def test_flagship_runs_as_pure_sql(spark):
    """The engine is Spark SQL-first: the flagship HotItems windowed
    top-N expressed as ONE spark.sql() string (window TVF + rank
    filter) returns exactly the operator pipeline's rows — the
    DataFrame and SQL surfaces are the same engine."""
    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    from conftest import SF_DIR

    base = QUERIES["hot_items_topn"].fn(spark, SF_DIR)
    cols = base.columns
    expect = sorted(tuple(r[c] for c in cols) for r in base.collect())
    load_table(spark, SF_DIR, "events").createOrReplaceTempView("__sql_events")
    got = spark.sql(
        """
        WITH w AS (
          SELECT window(ts, '1 hour', '5 minutes') AS win,
                 pmod(event_id, 50) AS item_id, count(*) AS cnt
          FROM __sql_events WHERE event_type = 'view'
          GROUP BY 1, 2),
        r AS (
          SELECT CAST(win.start AS LONG) AS ws, CAST(win.end AS LONG) AS we,
                 item_id, cnt,
                 row_number() OVER (PARTITION BY win ORDER BY cnt DESC, item_id) AS rnk
          FROM w)
        SELECT * FROM r WHERE rnk <= 3
        """
    )
    assert sorted(tuple(r[c] for c in cols) for r in got.collect()) == expect


def test_rotation_orders_never_checked_first_with_priority():
    """The driver hashes the first 50 of queries() each round; the
    rotation must (a) front-load names with no CORRECTNESS_r*.json row
    yet — oracle-backed before rows-only, (b) boost _DRIVER_PRIORITY
    names to the head of the never-checked tier (round-6 verdict #7:
    the streaming replays must reach the next driver window despite
    registering last), and (c) push already-checked names to the back,
    least-recently-checked first."""
    import json
    from pathlib import Path

    import __spark_entry__ as e

    order = e._rotation_order()
    assert sorted(order) == sorted(QUERIES), "rotation must be a permutation"

    last = {}
    for rec in sorted(Path(e.__file__).resolve().parent.glob("CORRECTNESS_r*.json")):
        try:
            names = json.loads(rec.read_text())
            rnd = int("".join(ch for ch in rec.stem if ch.isdigit()) or 0)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for n in names:
            last[n] = max(last.get(n, 0), rnd)
    never = [n for n in order if n not in last]
    if never:
        # every never-checked name precedes every checked name
        first_checked = min(order.index(n) for n in last) if last else len(order)
        assert max(order.index(n) for n in never) < first_checked
        # priority names lead the never-checked tier
        prio = [n for n in never if n in e._DRIVER_PRIORITY]
        for p in prio:
            assert order.index(p) < min(
                order.index(n) for n in never if n not in e._DRIVER_PRIORITY
            )
        # within the non-priority never-checked tier, oracle-backed first
        plain = [n for n in never if n not in e._DRIVER_PRIORITY]
        tail_rows_only = [QUERIES[n].oracle is None for n in plain]
        assert tail_rows_only == sorted(tail_rows_only)
    # checked names sort by last-checked round ascending
    checked_in_order = [n for n in order if n in last]
    rounds = [last[n] for n in checked_in_order]
    assert rounds == sorted(rounds)

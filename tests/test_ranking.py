"""operators/ranking.py — distributed global_rank / global_ntile must be
bit-identical to the single-partition window functions they replace
(ties, skewed key distributions, N < n, and empty input included)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flinkecuserbehavioranalysis_spark.operators.ranking import global_ntile, global_rank


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v long")


CASES = [
    list(range(100)),
    [7] * 40,  # all ties — order falls to the id tiebreak
    [1, 1, 2, 2, 3] * 13,  # heavy ties, N=65
    [5, 3, 9],  # N < shards and N < n
]


@pytest.mark.parametrize("vals", CASES)
def test_global_rank_matches_single_partition_row_number(spark, vals):
    df = _df(spark, vals)
    order = [F.col("v").desc(), F.col("id").asc()]
    ranked, total = global_rank(df, order, rank_col="r", shards=8)
    got = {(r.id, r.r) for r in ranked.collect()}
    w = Window.orderBy(*order)
    want = {
        (r.id, r.r)
        for r in df.withColumn("r", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want
    assert total == len(vals)


@pytest.mark.parametrize("vals", CASES)
@pytest.mark.parametrize("n", [1, 3, 10])
def test_global_ntile_matches_window_ntile(spark, vals, n):
    df = _df(spark, vals)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r.id, r.b)
        for r in global_ntile(df, order, n, bucket_col="b", shards=8).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r.id, r.b)
        for r in df.withColumn("b", F.ntile(n).over(w).cast("long")).collect()
    }
    assert got == want


def test_global_rank_empty_input(spark):
    df = _df(spark, []).filter(F.lit(False))
    ranked, total = global_rank(df, [F.col("v").asc()], rank_col="r", shards=4)
    assert total == 0 and ranked.count() == 0


def test_ntile_more_buckets_than_rows_degenerates_to_rank(spark):
    df = _df(spark, [10, 20, 30])
    out = global_ntile(
        df, [F.col("v").asc(), F.col("id").asc()], 10, bucket_col="b", shards=4
    )
    assert {(r.v, r.b) for r in out.collect()} == {(10, 1), (20, 2), (30, 3)}


@pytest.mark.parametrize("vals", CASES)
@pytest.mark.parametrize("frame", [(3, 3), (0, 2), (4, 0), (1, 1)])
def test_centered_rows_agg_matches_keyless_window(spark, vals, frame):
    """operators/ranking.py centered_rows_agg — the global_rank +
    offset-explode + keyed-agg plan must be bit-identical to the
    single-partition ROWS BETWEEN window it replaces, including
    truncated frames at both ends, ties, and asymmetric frames."""
    from flinkecuserbehavioranalysis_spark.operators.ranking import centered_rows_agg

    p, f = frame
    df = _df(spark, vals)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        (r.id, r.s, r.c)
        for r in centered_rows_agg(
            df, order, {"s": F.sum("v"), "c": F.count(F.lit(1))},
            preceding=p, following=f, shards=8,
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(-p, f)
    want = {
        (r.id, r.s, r.c)
        for r in df.select(
            "id", F.sum("v").over(w).alias("s"), F.count(F.lit(1)).over(w).alias("c")
        ).collect()
    }
    assert got == want


def test_centered_rows_agg_empty_input(spark):
    from flinkecuserbehavioranalysis_spark.operators.ranking import centered_rows_agg

    df = _df(spark, []).limit(0)
    out = centered_rows_agg(df, [F.col("v")], {"s": F.sum("v")}, 3, 3, shards=4)
    assert out.count() == 0


def test_salted_join_matches_plain_join(spark):
    """operators/skew.py salted_join — same multiset of rows as the
    plain join under a pathologically hot key, all join types."""
    from flinkecuserbehavioranalysis_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, k * 10) for k in range(2, 40)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (99, "never")], "k long, tag string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.payload, r.tag)
            for r in salted_join(big, small, "k", salt=4, how=how).collect()
        )
        want = sorted(
            (r.k, r.payload, r.tag) for r in big.join(small, "k", how).collect()
        )
        assert got == want, how


def test_salted_join_rejects_small_side_preserving_types(spark):
    from flinkecuserbehavioranalysis_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 2)], "k long, payload long")
    small = spark.createDataFrame([(1, "a")], "k long, tag string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="replicated per salt"):
        salted_join(big, small, "k", how="full")


def test_salted_join_spreads_full_duplicate_rows(spark):
    """A hot key made of IDENTICAL rows must still spread across salts
    (the per-row monotonically_increasing_id term; a pure column hash
    would give every duplicate the same salt)."""
    from flinkecuserbehavioranalysis_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, 7)] * 400, "k long, payload long"
    ).repartition(8)
    small = spark.createDataFrame([(1, "hot")], "k long, tag string")
    n_salts = 4
    salted = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64("k", "payload") + F.monotonically_increasing_id(),
            F.lit(n_salts),
        ),
    )
    used = salted.select("__salt").distinct().count()
    assert used > 1, "identical rows all landed on one salt"
    # and the join output is still exactly the plain join
    got = sorted(
        (r.k, r.payload, r.tag)
        for r in salted_join(big, small, "k", salt=n_salts).collect()
    )
    want = sorted((r.k, r.payload, r.tag) for r in big.join(small, "k").collect())
    assert got == want


def test_salted_join_rejects_preexisting_salt_column(spark):
    from flinkecuserbehavioranalysis_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 0)], "k long, __salt long")
    small = spark.createDataFrame([(1, "a")], "k long, tag string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="__salt"):
        salted_join(big, small, "k")
    with _pytest.raises(ValueError, match="__salt"):
        salted_join(small, big, "k")

"""Unit semantics for operators.classifier (batch perceptron) and the
temperature-mix sampler — naive-parity, partitioning independence, and
the degenerate regimes the registry sweep can't isolate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flinkecuserbehavioranalysis_spark.operators.classifier import (
    curve_frame,
    perceptron_curve,
)
from flinkecuserbehavioranalysis_spark.operators.sampling import temperature_mix


def _naive_perceptron(rows, rounds):
    """Reference implementation: plain python batch perceptron over
    (x1, .., xd, y) tuples — the spec perceptron_curve must match."""
    d = len(rows[0]) - 1 if rows else 0
    w = [0] * (d + 1)
    curve = []
    for r in range(rounds + 1):
        mis = [
            (1, *xs, y)
            for *xs, y in rows
            if y * sum(wi * xi for wi, xi in zip(w, (1, *xs))) <= 0
        ]
        curve.append((r, len(mis), len(rows)))
        if r < rounds:
            for row in mis:
                y = row[-1]
                for i in range(d + 1):
                    w[i] += y * row[i]
    return curve, w


def _mk(spark, rows, partitions=1):
    return spark.createDataFrame(
        rows, "x1 long, x2 long, y long"
    ).repartition(partitions)


def test_perceptron_matches_naive(spark):
    rows = [
        (3, 10, 1), (4, 12, 1), (5, 20, 1), (9, 2, -1),
        (8, 1, -1), (7, 3, -1), (2, 15, 1), (10, 1, -1),
        (6, 6, -1), (1, 30, 1),
    ]
    curve, w = perceptron_curve(_mk(spark, rows), ["x1", "x2"], "y", rounds=4)
    exp_curve, exp_w = _naive_perceptron(rows, 4)
    assert curve == exp_curve
    assert w == exp_w


def test_perceptron_partitioning_independent(spark):
    rows = [(i % 7, (i * 3) % 11, 1 if i % 3 else -1) for i in range(60)]
    one = perceptron_curve(_mk(spark, rows, 1), ["x1", "x2"], "y", rounds=3)
    many = perceptron_curve(_mk(spark, rows, 13), ["x1", "x2"], "y", rounds=3)
    assert one == many


def test_perceptron_round0_is_majority_class_error(spark):
    # w=0 => sign(0) counted as error for every row: round-0 errors = n
    rows = [(1, 1, 1), (2, 2, 1), (3, 3, -1)]
    curve, _ = perceptron_curve(_mk(spark, rows), ["x1", "x2"], "y", rounds=0)
    assert curve == [(0, 3, 3)]


def test_perceptron_null_rows_excluded(spark):
    rows = [(3, 10, 1), (None, 12, 1), (8, None, -1), (7, 3, None), (9, 2, -1)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    curve, w = perceptron_curve(df, ["x1", "x2"], "y", rounds=2)
    exp_curve, exp_w = _naive_perceptron([(3, 10, 1), (9, 2, -1)], 2)
    assert curve == exp_curve
    assert w == exp_w


def test_perceptron_empty_input(spark):
    df = spark.createDataFrame([], "x1 long, x2 long, y long")
    curve, w = perceptron_curve(df, ["x1", "x2"], "y", rounds=2)
    assert curve == [(0, 0, 0), (1, 0, 0), (2, 0, 0)]
    assert w == [0, 0, 0]
    out = curve_frame(spark, curve).collect()
    assert all(r["error_rate"] is None for r in out)


def test_perceptron_separable_converges_to_zero_errors(spark):
    # y = +1 iff x1 >= 5: linearly separable with the bias feature.
    # The batch variant needs more rounds than online (18 in the naive
    # replay) — assert the engine reaches the same zero-error round.
    rows = [(i, 0, 1 if i >= 5 else -1) for i in range(20)]
    exp_curve, _ = _naive_perceptron(rows, 18)
    assert exp_curve[-1][1] == 0  # spec sanity: separable data converges
    curve, _ = perceptron_curve(_mk(spark, rows), ["x1", "x2"], "y", rounds=18)
    assert curve == exp_curve


def test_curve_frame_rate(spark):
    out = {
        r["round"]: r["error_rate"]
        for r in curve_frame(spark, [(0, 1, 4), (1, 0, 4)]).collect()
    }
    assert out == {0: 0.25, 1: 0.0}


def test_temperature_mix_weights(spark):
    df = spark.createDataFrame(
        [("en",)] * 90 + [("de",)] * 9 + [("fi",)] * 1, "lang string"
    )
    rows = {r["lang"]: r for r in temperature_mix(df, "lang").collect()}
    assert rows["en"]["n_docs"] == 90
    # shares sum to 1; temperature weights sum to ~1 (6 dp rounding)
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-5
    assert abs(sum(r["temp_weight"] for r in rows.values()) - 1.0) < 1e-5
    # T=0.5 flattens: head boosted < 1, tail > 1
    assert rows["en"]["boost"] < 1.0 < rows["fi"]["boost"]
    # and the expected sqrt ratios hold
    exp_fi = math.sqrt(1) / (math.sqrt(90) + math.sqrt(9) + math.sqrt(1))
    assert rows["fi"]["temp_weight"] == pytest.approx(exp_fi, abs=1e-5)


def test_temperature_mix_uniform_is_noop(spark):
    df = spark.createDataFrame([("a",), ("b",)], "lang string")
    for r in temperature_mix(df, "lang").collect():
        assert r["share"] == 0.5
        assert r["temp_weight"] == 0.5
        assert r["boost"] == 1.0


def test_temperature_mix_rejects_other_temperatures(spark):
    df = spark.createDataFrame([("a",)], "lang string")
    with pytest.raises(ValueError, match="T=0.5"):
        temperature_mix(df, "lang", temperature=0.7)


def test_temperature_mix_empty(spark):
    df = spark.createDataFrame([], "lang string")
    assert temperature_mix(df, "lang").count() == 0


def test_score_expr_streaming_apply_matches_batch(spark, tmp_path):
    """Train-offline/apply-online: the frozen-weight scoring projection
    is stateless and shuffle-free, so it runs unchanged on a streaming
    frame (the bpe apply pattern) — bounded replay equals the batch
    scores row for row."""
    from flinkecuserbehavioranalysis_spark.operators.classifier import score_expr
    from flinkecuserbehavioranalysis_spark.streaming.jobs import run_bounded

    rows = [(i, (i * 7) % 13, (i * 3) % 5) for i in range(40)]
    batch = spark.createDataFrame(rows, "id long, x1 long, x2 long")
    src = str(tmp_path / "scored_src")
    batch.coalesce(2).write.parquet(src)

    w = [-4, 1, -2]  # bias, w1, w2 — arbitrary frozen weights

    def scored(df):
        return df.select(
            "id", score_expr(w, [F.col("x1"), F.col("x2")]).alias("pred")
        )

    stream = spark.readStream.schema(batch.schema).parquet(src)
    got = {r.id: r.pred for r in run_bounded(scored(stream))}
    exp = {r.id: r.pred for r in scored(batch).collect()}
    assert got == exp
    # and the convention: boundary (dot == 0) predicts -1
    naive = {i: (1 if (-4 + x1 - 2 * x2) > 0 else -1) for i, x1, x2 in rows}
    assert got == naive


def test_score_expr_weight_arity_checked(spark):
    from flinkecuserbehavioranalysis_spark.operators.classifier import score_expr

    with pytest.raises(ValueError, match="weights"):
        score_expr([1, 2], [F.col("a"), F.col("b")])

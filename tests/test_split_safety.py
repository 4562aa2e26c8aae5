"""Leakage-safe splitting: the cluster-keyed split must put both
endpoints of every near-dup pair in the same split (zero off-diagonal
cells), while the naive per-document split is allowed to leak."""

from __future__ import annotations

from pyspark.sql import functions as F

from flinkecuserbehavioranalysis_spark.plans.queries import (
    _doc_canonical_map,
    _doc_lsh_pairs,
    _split_case,
)

from conftest import SF_DIR


def test_cluster_safe_split_has_zero_leaks(spark):
    pairs = _doc_lsh_pairs(spark, SF_DIR)
    canon = _doc_canonical_map(spark, SF_DIR)
    ca = canon.select(
        F.col("doc_id").alias("doc_a"), F.col("canonical_id").alias("__ka")
    )
    cb = canon.select(
        F.col("doc_id").alias("doc_b"), F.col("canonical_id").alias("__kb")
    )
    leaked = (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(_split_case(F.col("__ka")) != _split_case(F.col("__kb")))
        .count()
    )
    assert leaked == 0


def test_split_case_matches_hash_split(spark):
    # the pure-Column split label must agree with the operator row-for-row
    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.operators.sampling import hash_split

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    mismatches = (
        hash_split(docs, "doc_id")
        .filter(F.col("split") != _split_case(F.col("doc_id")))
        .count()
    )
    assert mismatches == 0

"""Persist-lifecycle registry (flinkecuserbehavioranalysis_spark/cache.py):
LRU cap bounds live persisted frames, clear_cache() releases them, and a
second sf_dir doesn't grow executor storage without bound (round-4
verdict "What's wrong" #1)."""

from __future__ import annotations

import pytest

from flinkecuserbehavioranalysis_spark import cache
from flinkecuserbehavioranalysis_spark.io import load_table
from flinkecuserbehavioranalysis_spark.plans.queries import _cached_canon, clear_cache

from conftest import SF_DIR


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_lru_cap_bounds_live_persists(spark):
    clear_cache()
    old_cap = cache.max_entries
    cache.max_entries = 3
    try:
        base = _n_persisted(spark)
        for i in range(8):
            _cached_canon(
                spark,
                SF_DIR,
                f"__test_family_{i}",
                lambda: load_table(spark, SF_DIR, "region").persist(),
            )
        assert cache.stats()["entries"] == 3
        # evicted frames are unpersisted: at most cap persists above base
        assert _n_persisted(spark) - base <= 3
    finally:
        cache.max_entries = old_cap
        clear_cache()


def test_hit_returns_same_frame_and_refreshes_recency(spark):
    clear_cache()
    built = []

    def build():
        df = load_table(spark, SF_DIR, "nation").persist()
        built.append(df)
        return df

    a = _cached_canon(spark, SF_DIR, "__test_hit", build)
    b = _cached_canon(spark, SF_DIR, "__test_hit", build)
    assert a is b and len(built) == 1
    clear_cache()


def test_clear_cache_releases_everything(spark):
    clear_cache()
    base = _n_persisted(spark)
    for fam in ("__t_a", "__t_b"):
        df = _cached_canon(
            spark,
            SF_DIR,
            fam,
            lambda: load_table(spark, SF_DIR, "region").persist(),
        )
        df.count()  # materialize the cache blocks
    assert _n_persisted(spark) - base >= 1
    n = clear_cache(spark)
    assert n >= 2
    assert cache.stats()["entries"] == 0
    assert _n_persisted(spark) <= base


def test_second_sf_dir_does_not_double_storage(spark):
    """Two sf_dirs under a small cap: total live persists stay at the
    cap, not at (families x sf_dirs)."""
    clear_cache()
    old_cap = cache.max_entries
    cache.max_entries = 2
    try:
        base = _n_persisted(spark)
        for sf_dir in (SF_DIR, SF_DIR + "/."):  # distinct keys, same data
            for fam in ("__m_x", "__m_y"):
                _cached_canon(
                    spark,
                    sf_dir,
                    fam,
                    lambda: load_table(spark, SF_DIR, "region").persist(),
                ).count()
        assert cache.stats()["entries"] == 2
        assert _n_persisted(spark) - base <= 2
    finally:
        cache.max_entries = old_cap
        clear_cache()


def test_pagerank_persists_are_memo_managed(spark):
    """pagerank's fixed-round e/deg persists register in the session
    frame cache keyed by the edge plan's semantic hash: a repeat call
    over the same edges is a memo HIT (no new cached relations), and
    clear_cache() releases the blocks (round-8 advice #2)."""
    from flinkecuserbehavioranalysis_spark.operators.graph import pagerank

    clear_cache()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], ["src", "dst"]
    )
    before = cache.stats()["entries"]
    r1 = pagerank(edges, iters=2)
    r1.count()
    grew = cache.stats()["entries"] - before
    assert grew == 2  # symmetrized edges + degrees, exactly once
    r2 = pagerank(edges, iters=2)
    assert cache.stats()["entries"] - before == 2  # memo hit, no growth
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))
    base = _n_persisted(spark)
    clear_cache()
    assert _n_persisted(spark) <= base


def test_prefix_filter_shingles_memo_managed(spark):
    """prefix_filter_pairs' corpus-scale shingle persist goes through
    the frame cache: repeat calls don't stack session-lifetime cached
    relations (round-8 advice #1)."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import prefix_filter_pairs

    clear_cache()
    docs = load_table(spark, SF_DIR, "documents")
    before = cache.stats()["entries"]
    out1 = prefix_filter_pairs(docs, threshold=0.75)
    out1.count()
    assert cache.stats()["entries"] - before == 1
    out2 = prefix_filter_pairs(docs, threshold=0.75)
    assert cache.stats()["entries"] - before == 1  # same semantic key → hit
    assert out1.count() == out2.count()
    clear_cache()


def test_ann_index_relations_memo_managed(spark):
    """r11 guard: the ANN index relations (IVF postings, PQ codes, int8
    codes) pin per (input hash, codebook hash, params) — a repeat call
    over the same corpus + codebook is a memo HIT (same frame, no new
    cache entries), and distinct params miss.  Streaming inputs must
    bypass the pin entirely (checkpointing a stream is illegal)."""
    from pyspark.sql import functions as F

    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
        quantize_embeddings,
    )

    clear_cache()
    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = kmeans_fit(emb, n_cells=4, train_iters=1)
    v = (
        emb.where(F.col("embedding").isNotNull())
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("v_vec"))
        .withColumn(
            "v_norm",
            F.sqrt(F.aggregate(F.transform("v_vec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
        )
    )
    before = cache.stats()["entries"]
    a1 = ivf_assign(v, seeds, corpus_probes=2)
    a1.count()
    grew = cache.stats()["entries"] - before
    a2 = ivf_assign(v, seeds, corpus_probes=2)
    assert a2 is a1  # memo hit: the pinned postings frame itself
    assert cache.stats()["entries"] - before == grew
    a3 = ivf_assign(v, seeds, corpus_probes=1)  # different params → miss
    assert a3 is not a1
    q1 = quantize_embeddings(emb)
    q2 = quantize_embeddings(emb)
    assert q2 is q1
    clear_cache()


def test_daily_purchase_spine_empty_events(spark, tmp_path):
    """An empty events table must yield an empty spine (typed schema),
    not an AnalysisException from CAST(None AS LONG) interpolation."""
    from flinkecuserbehavioranalysis_spark.plans.queries import daily_purchase_spine

    ev = load_table(spark, SF_DIR, "events").limit(0)
    sf_dir = str(tmp_path)
    ev.write.parquet(f"{sf_dir}/events.parquet")
    out = daily_purchase_spine(spark, sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "day",
        "n_big_purchases",
        "is_gap",
    ]


def test_load_table_plan_memo_and_invalidation(spark, tmp_path):
    """round-11 optimization: load_table memoizes the LOGICAL reader
    plan per (app, path, mtime, size) — repeated calls in one session
    return the same DataFrame handle (no re-listing / footer re-read),
    and REWRITING the file invalidates the memo (a stale file index
    would silently read the old snapshot)."""
    import time as _time

    from flinkecuserbehavioranalysis_spark.io import load_table

    a = load_table(spark, SF_DIR, "nation")
    b = load_table(spark, SF_DIR, "nation")
    assert a is b  # memo hit: same plan handle
    # rewritten file (different path→fresh key; same path→mtime key)
    p = tmp_path / "nation.parquet"
    a.limit(3).write.parquet(str(p))
    c1 = load_table(spark, str(tmp_path), "nation")
    n1 = c1.count()
    _time.sleep(0.01)
    import shutil

    shutil.rmtree(p)
    a.limit(5).write.parquet(str(p))
    c2 = load_table(spark, str(tmp_path), "nation")
    assert c2 is not c1  # mtime/size changed → fresh reader plan
    assert (n1, c2.count()) == (3, 5)


def test_kmeans_codebook_pinned_per_params(spark):
    """round-11 optimization: kmeans_fit pins the trained codebook per
    (input hash, params) — same call twice returns the same pinned
    frame (one Lloyd unroll per session), different params train
    separately."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import kmeans_fit

    clear_cache()
    emb = load_table(spark, SF_DIR, "embeddings")
    s1 = kmeans_fit(emb, n_cells=4, train_iters=2)
    s2 = kmeans_fit(emb, n_cells=4, train_iters=2)
    assert s1 is s2
    s3 = kmeans_fit(emb, n_cells=8, train_iters=2)
    assert s3 is not s1
    assert s1.count() <= 4 and s3.count() <= 8
    clear_cache()

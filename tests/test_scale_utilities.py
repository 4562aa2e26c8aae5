"""Scale utilities: salted aggregation equivalence, streaming interval
join vs batch, CSV/apache-log readers, holistic quantile operator."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flinkecuserbehavioranalysis_spark.io import load_table, read_apache_log, read_csv_events
from flinkecuserbehavioranalysis_spark.operators.joins import interval_join
from flinkecuserbehavioranalysis_spark.operators.skew import salted_count, salted_sum
from flinkecuserbehavioranalysis_spark.schemas import LOGIN_EVENT, ORDER_EVENT
from flinkecuserbehavioranalysis_spark.streaming.jobs import (
    read_events_stream,
    run_bounded,
    streaming_interval_join,
)

from conftest import SF_DIR


def test_salted_count_equals_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        (r["event_type"],): r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["event_type"],): r["cnt"]
        for r in salted_count(ev, ["event_type"], salt_from="event_id").collect()
    }
    assert plain == salted


def test_salted_sum_equals_plain(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    # integer-exact sum (quantities are whole-valued doubles ≤ 50)
    plain = {
        r["l_returnflag"]: r["t"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("t"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["total"]
        for r in salted_sum(
            li, ["l_returnflag"], F.col("l_quantity").cast("decimal(18,2)"), salt_from="l_orderkey"
        ).collect()
    }
    assert plain == salted


def test_streaming_interval_join_matches_batch(spark):
    o = read_events_stream(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("ts")
    )
    l = read_events_stream(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", F.col("l_shipdate").alias("ts")
    )
    j = streaming_interval_join(
        o, l, key="k", lower_seconds=0, upper_seconds=30 * 86400,
        left_watermark="0 seconds", right_watermark="0 seconds",
    ).select(
        F.col("l.k").alias("order_id"),
        F.col("r.l_linenumber").alias("line_no"),
        F.col("l.ts").cast("long").alias("order_ts"),
        F.col("r.ts").cast("long").alias("ship_ts"),
    )
    got = run_bounded(j, "append")
    batch = interval_join(
        load_table(spark, SF_DIR, "orders").select(
            F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("ts")
        ),
        load_table(spark, SF_DIR, "lineitem").select(
            F.col("l_orderkey").alias("k"), "l_linenumber", F.col("l_shipdate").alias("ts")
        ),
        key="k", lower_seconds=0, upper_seconds=30 * 86400,
    ).select(
        F.col("l.k").alias("order_id"),
        F.col("r.l_linenumber").alias("line_no"),
        F.col("l.ts").cast("long").alias("order_ts"),
        F.col("r.ts").cast("long").alias("ship_ts"),
    ).collect()
    cols = ["order_id", "line_no", "order_ts", "ship_ts"]
    assert sorted(tuple(r[c] for c in cols) for r in got) == sorted(
        tuple(r[c] for c in cols) for r in batch
    )
    assert len(got) > 0


def test_read_csv_events(spark, tmp_path):
    # reference LoginLog.csv format: userId,ip,eventType,epochSeconds
    p = tmp_path / "login.csv"
    p.write_text("1001,10.0.0.1,fail,1558430842\n1001,10.0.0.2,success,1558430845\n")
    df = read_csv_events(spark, str(p), LOGIN_EVENT)
    rows = df.collect()
    assert df.dtypes == [
        ("user_id", "bigint"), ("ip", "string"), ("event_type", "string"), ("ts", "timestamp"),
    ]
    assert rows[0]["user_id"] == 1001 and rows[0]["ts"].timestamp() == 1558430842.0


def test_read_csv_order_events(spark, tmp_path):
    # reference OrderLog.csv format: orderId,eventType,txId,epochSeconds
    p = tmp_path / "orders.csv"
    p.write_text("34729,create,,1558430842\n34729,pay,sd76f87d6,1558430844\n")
    df = read_csv_events(spark, str(p), ORDER_EVENT)
    rows = sorted(df.collect(), key=lambda r: r["ts"])
    assert rows[1]["tx_id"] == "sd76f87d6"
    assert rows[0]["tx_id"] is None  # empty create tx (OrderTimeout.scala drops it)


def test_read_apache_log(spark, tmp_path):
    # reference apache.log format: ip - - dd/MM/yyyy:HH:mm:ss +0000 METHOD url
    p = tmp_path / "apache.log"
    p.write_text(
        "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /presentations/a.png\n"
        "83.149.9.217 - - 17/05/2015:10:05:46 +0000 POST /api/x\n"
    )
    df = read_apache_log(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["event_time"])
    assert rows[0]["ip"] == "83.149.9.216"
    assert rows[0]["method"] == "GET"
    assert rows[1]["url"] == "/api/x"
    assert rows[0]["event_time"].strftime("%Y-%m-%d %H:%M:%S") == "2015-05-17 10:05:03"


def test_windowed_quantiles_operator(spark):
    from flinkecuserbehavioranalysis_spark.operators.custom_agg import windowed_quantiles

    ev = load_table(spark, SF_DIR, "events")
    got = windowed_quantiles(ev, "ts", 86400, "value", quantiles=(0.5,))
    rows = got.collect()
    assert len(rows) > 0
    # spot-check one window against a driver-side computation
    import pandas as pd

    first_ws = rows[0]["ws"]
    vals = [
        r["value"]
        for r in ev.filter(
            F.floor(F.col("ts").cast("long") / 86400).cast("long") * 86400 == first_ws
        ).collect()
    ]
    expect = round(float(pd.Series(vals).quantile(0.5)), 6)
    assert next(r["q50"] for r in rows if r["ws"] == first_ws) == expect


def test_windowed_quantiles_group_size_guard(spark):
    """The exact path buffers each window group in one pandas frame; the
    guard must fail loudly (naming the window) BEFORE buffering when a
    group exceeds max_group_rows — not silently OOM an executor."""
    import pytest

    from flinkecuserbehavioranalysis_spark.operators.custom_agg import windowed_quantiles

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="max_group_rows"):
        windowed_quantiles(ev, "ts", 86400, "value", (0.5,), max_group_rows=10)
    # a bound nothing exceeds (and None = guard off) both pass through
    assert windowed_quantiles(
        ev, "ts", 86400, "value", (0.5,), max_group_rows=None
    ).count() == windowed_quantiles(ev, "ts", 86400, "value", (0.5,)).count()


def test_windowed_quantiles_kernel_matches_promoted_jvm_plan(spark):
    """Round-8 (round-7 verdict #3): the registry's
    windowed_value_quantiles is now the built-in percentile() plan
    (whole-stage codegen, no Python worker — 1.25 s -> 0.40 s at
    sf0.1); the applyInPandas kernel remains the documented §2.10
    ProcessWindowFunction surface.  Pin them row-identical so the
    promotion can never drift from the kernel it replaced."""
    from flinkecuserbehavioranalysis_spark.operators.custom_agg import (
        windowed_quantiles,
    )
    from flinkecuserbehavioranalysis_spark.plans.queries import (
        QUERIES,
        _finite_or_null,
    )

    plan_rows = sorted(
        tuple(r) for r in QUERIES["windowed_value_quantiles"].fn(spark, SF_DIR).collect()
    )
    ev = load_table(spark, SF_DIR, "events").where(_finite_or_null("value"))
    kernel_rows = sorted(
        tuple(r)
        for r in windowed_quantiles(ev, "ts", 86400, "value", (0.5, 0.9)).collect()
    )
    assert plan_rows == kernel_rows
    assert len(plan_rows) > 0


def test_as_of_join_semantics(spark):
    from flinkecuserbehavioranalysis_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [("A", 1, 1), ("A", 5, 2), ("A", 10, 3), ("B", 4, 4)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [("A", 0, 100), ("A", 5, 105), ("A", 7, 107), ("A", 99, 199), ("C", 1, 300)],
        "k string, rt long, rid long",
    )
    out = as_of_join(left, right, key="k", left_ts="t", right_ts="rt", right_payload=["rid"])
    got = {(r.k, r.t): r.rid for r in out.collect()}
    assert got == {
        ("A", 1): 100,   # latest right at-or-before 1
        ("A", 5): 105,   # tie: right at the same ts IS visible (<=)
        ("A", 10): 107,  # right at 99 is in the future, ignored
        ("B", 4): None,  # no right rows for key B
    }


def test_ivf_topk_agrees_with_brute_force(spark):
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from flinkecuserbehavioranalysis_spark.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = ivf_topk(emb, q, n_cells=8, nprobe=3, k=5).collect()
    exact_cos = {(r.q_id, r.neighbor_id): r.cos for r in exact}
    approx_pairs = {(r.q_id, r.neighbor_id) for r in approx}
    # per-query row bounds and rank sanity
    from collections import Counter

    per_q = Counter(r.q_id for r in approx)
    assert all(n <= 5 for n in per_q.values()) and len(per_q) == 3
    assert all(1 <= r.rnk <= 5 for r in approx)
    assert all(r.q_id != r.neighbor_id for r in approx)
    # every scored pair the index returns must carry the exact cosine
    bf_all = {
        (r.q_id, r.neighbor_id): r.cos
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    assert all(abs(bf_all[p] - c) < 1e-9 for p, c in
               {(r.q_id, r.neighbor_id): r.cos for r in approx}.items())
    # recall against the exact top-5 should be nonzero on clustered data
    assert len(approx_pairs & set(exact_cos)) > 0


def test_bucketed_neardup_cap_bounds_fat_bucket(spark):
    """One fat bucket must not go quadratic: max_bucket sub-buckets it
    (deterministic md5(vec_id) % ceil(size/cap)), pairs form only
    within a sub-bucket, and every emitted pair still carries the exact
    cosine.  Small buckets (size ≤ cap) are untouched."""
    import hashlib
    from itertools import combinations

    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        bucketed_neardup_pairs,
    )

    rows = [(i, 0, [float((i * 7 + j * 3) % 11 + 1) for j in range(4)]) for i in range(40)]
    rows += [(100 + i, 1, [float(j + i + 1) for j in range(4)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, label long, embedding array<double>")

    uncapped = {
        (r.vec_a, r.vec_b): r.cos
        for r in bucketed_neardup_pairs(df, threshold=-1.0, max_bucket=None).collect()
    }
    assert len(uncapped) == 40 * 39 // 2 + 3  # fat bucket all-pairs + small bucket

    capped = {
        (r.vec_a, r.vec_b): r.cos
        for r in bucketed_neardup_pairs(df, threshold=-1.0, max_bucket=8).collect()
    }
    n_sub = -(-40 // 8)  # ceil(40/8) = 5 sub-buckets for the fat bucket

    def sub(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_sub

    expect = {(a, b) for a, b in combinations(range(40), 2) if sub(a) == sub(b)}
    expect |= {(100, 101), (100, 102), (101, 102)}  # size-3 bucket: n_sub=1, untouched
    assert set(capped) == expect
    # capped output is a strict subset of uncapped with identical cosines
    assert all(capped[p] == uncapped[p] for p in capped)
    # bound: Σ per-sub-bucket pairs ≤ |b|·cap (vs 780 uncapped)
    fat_pairs = sum(1 for (a, b) in capped if b < 100)
    assert fat_pairs <= 40 * 8
    assert fat_pairs < len(uncapped) - 3


@pytest.mark.soak
def test_ivf_recall_at_10_floor(spark):
    """An approximate index without a measured recall is unfinished:
    recall@10 of ivf_topk (n_cells=8, nprobe=3, 2 Lloyd training
    iterations, top-2 multi-probe corpus assignment — the registered
    ann_ivf_topk configuration) vs brute_force_topk, all sf0.01
    embeddings as queries.  Floor 0.7; the measured value is printed so
    the run log records it (same posture as the HLL / percentile
    tolerance tests).  For calibration: untrained single-probe at
    n_cells=16 measures ~0.39 on the same data."""
    from collections import defaultdict

    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    ex, ap = defaultdict(set), defaultdict(set)
    for r in brute_force_topk(emb, emb, k=10).collect():
        ex[r.q_id].add(r.neighbor_id)
    for r in ivf_topk(
        emb, emb, n_cells=8, nprobe=3, k=10, train_iters=2, corpus_probes=2
    ).collect():
        ap[r.q_id].add(r.neighbor_id)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    recall = sum(recalls) / len(recalls)
    print(f"IVF-Flat recall@10 sf0.01 n_cells=8 nprobe=3 train=2 mp=2: "
          f"{recall:.4f} over {len(recalls)} queries")
    assert len(recalls) == emb.count()
    assert recall >= 0.7, f"IVF recall@10 {recall:.4f} below 0.7 floor"

    # the registered query trains on a 50% hash-sample (the corpus-scale
    # posture) — the quantizer must not owe its recall to full training
    aps = defaultdict(set)
    for r in ivf_topk(
        emb, emb, n_cells=8, nprobe=3, k=10, train_iters=2, corpus_probes=2,
        train_fraction=0.5,
    ).collect():
        aps[r.q_id].add(r.neighbor_id)
    recalls_s = [len(ex[q] & aps[q]) / len(ex[q]) for q in ex]
    recall_s = sum(recalls_s) / len(recalls_s)
    print(f"IVF-Flat recall@10 sampled-train(0.5): {recall_s:.4f}")
    assert recall_s >= 0.7, f"sampled-train recall@10 {recall_s:.4f} below 0.7 floor"


def test_hll_uv_within_tolerance(spark):
    """approx_count_distinct (HLL++, the bloom-filter replacement) must
    land within a few rsd of the exact per-window UV."""
    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.operators.distinct import (
        windowed_distinct_count,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = {
        (r.ws, r.we): r.uv
        for r in windowed_distinct_count(ev, "ts", "1 hour", "user_id").collect()
    }
    approx = {
        (r.ws, r.we): r.uv
        for r in windowed_distinct_count(
            ev, "ts", "1 hour", "user_id", approx=True, rsd=0.05
        ).collect()
    }
    assert set(exact) == set(approx)
    for w, ex in exact.items():
        assert abs(approx[w] - ex) <= max(3, 5 * 0.05 * ex), (w, ex, approx[w])


def test_percentile_approx_tracks_exact_quantiles(spark):
    """percentile_approx (the 100 TB quantile path) vs the exact
    applyInPandas quantiles: approx returns an actual data point near
    the requested rank, so compare against the exact value with a
    generous rank-epsilon tolerance."""
    import contextlib
    import io as _io

    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.operators.custom_agg import (
        windowed_quantiles,
        windowed_quantiles_approx,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # rank-epsilon bracket: the approx value must fall between the exact
    # quantiles 0.1 rank below/above (value-distance bounds are fragile
    # on small windows where adjacent order statistics gap widely)
    brackets = {
        r.ws: (r.q40, r.q60, r.q80, r.q100)
        for r in windowed_quantiles(ev, "ts", 86400, "value", (0.4, 0.6, 0.8, 1.0)).collect()
    }
    approx_df = windowed_quantiles_approx(ev, "ts", 86400, "value", (0.5, 0.9))
    approx = {r.ws: (r.q50, r.q90) for r in approx_df.collect()}
    assert set(brackets) == set(approx)
    for ws, (q40, q60, q80, q100) in brackets.items():
        a50, a90 = approx[ws]
        assert q40 <= a50 <= q60, (ws, q40, a50, q60)
        assert q80 <= a90 <= q100, (ws, q80, a90, q100)
    # the sketch twin must be pure JVM: no Arrow/pandas stage in its plan
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        approx_df.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" not in plan and "Python" not in plan, plan
    # exact n in both twins
    n_exact = {r.ws: r.n for r in windowed_quantiles(ev, "ts", 86400, "value").collect()}
    n_approx = {r.ws: r.n for r in approx_df.collect()}
    assert n_exact == n_approx


@pytest.mark.soak
def test_results_invariant_under_partitioning(spark):
    """Distributed determinism: the same query must produce identical
    rows at different shuffle-partition counts — catches order-dependent
    float summation and unstable rank tiebreaks, the classic scale-up
    correctness failures."""
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    names = [
        "pricing_summary",        # decimal aggregation
        "hot_items_topn",         # windowed count + rank ties
        "event_last_order_asof",  # per-key ordered window
        "dedup_minhash_lsh",      # hash aggregation + self-join
        "embedding_label_centroids",  # decimal vector sums
        "embedding_kmeans_stats",     # iterative decimal centroid updates
        "ann_cosine_lsh_neardup",     # int64 projection folds + banded join
        "funnel_daily_conversion",    # chained conditional-min joins
        "corpus_prepare_stats",       # composed scrub/dedup/decontaminate
    ]
    sf = "/root/testdata/sf0.001"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = sorted(map(tuple, QUERIES[n].fn(spark, sf).collect()), key=repr)
                results.setdefault(n, []).append(rows)
        for n, (a, b) in results.items():
            assert a == b, f"{n} differs between partition counts"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


@pytest.mark.soak
def test_bench_contract_single_json_line():
    """bench.py must print exactly one parseable JSON line with the
    driver-contract keys, exercised at the smoke scale factor."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8")
    # --reps 1: the contract under test is the OUTPUT SHAPE, not the
    # median protocol — the default 3 reps tripled the full-registry
    # smoke run past the subprocess timeout once the registry passed
    # ~200 queries
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--reps", "1"],
        capture_output=True, text=True, timeout=500, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out.stdout[-2000:]
    d = json.loads(json_lines[0])
    assert d["unit"] == "sec" and d["queries"] and d["value"] > 0
    assert d["sf"] == 0.001
    assert d["reps"] == 1 and d["cold_total"] >= d["value"] > 0
    assert 0 < d["driver50_total"] < d["value"]


def test_hash_split_stability(spark):
    """Split assignment is a pure function of the key: disjoint, total,
    rerun-stable, and unchanged when the corpus grows (the eval-set
    contamination guard)."""
    from flinkecuserbehavioranalysis_spark.io import load_table
    from flinkecuserbehavioranalysis_spark.operators.sampling import hash_split

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    full = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    again = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert full == again
    assert set(full.values()) <= {"train", "validation", "test"}
    # grow-stability: assignments on a subset match the full corpus
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r.doc_id: r.split for r in hash_split(subset, "doc_id").collect()}
    assert all(full[k] == v for k, v in sub.items())
    # rough proportions at n=100
    from collections import Counter

    c = Counter(full.values())
    assert c["train"] > c["validation"] and c["train"] > c["test"]


def test_pack_sequences_matches_naive_greedy(spark):
    """Sequence packing must equal the naive per-bucket greedy fold:
    deterministic bucket from md5(doc_id), docs packed in id order,
    a new bin starts when the running total passes the target."""
    import hashlib

    from flinkecuserbehavioranalysis_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join(["w"] * (i % 37 + 1))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target, buckets = 50, 4
    got = {
        r.doc_id: (r.n_tokens, r.bucket, r.bin, r.tok_offset)
        for r in pack_sequences(df, target_tokens=target, buckets=buckets).collect()
    }

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % buckets

    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for i, text in rows:
        by_bucket.setdefault(bucket(i), []).append((i, len(text.split(" "))))
    expect = {}
    for b, docs in by_bucket.items():
        before = 0
        for i, n in sorted(docs):
            expect[i] = (n, b, before // target, before % target)
            before += n
    assert got == expect
    # every doc starts strictly inside its bin
    assert all(off < target for (_, _, _, off) in got.values())


def test_duplicate_components_transitive_chain(spark):
    """a~b, b~c, c~d must collapse to ONE cluster labeled min(a) even
    though a~d was never emitted as a pair — the transitive closure the
    pairwise ops deliberately leave to this operator.  Isolated docs
    keep themselves as canonical."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        canonicalize_duplicates,
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    comp = {r.v: r.label for r in duplicate_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 10, 11, 99)], "doc_id long")
    canon = {r.doc_id: r.canonical_id for r in canonicalize_duplicates(docs, pairs).collect()}
    assert canon == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 10: 10, 11: 10, 99: 99}


@pytest.mark.soak
def test_star_components_match_hashmin_on_fixtures(spark):
    """deep=True (large-star/small-star) must produce EXACTLY the same
    (v, label) mapping as hash-min on shallow fixtures: the chain+
    isolated-pairs fixture and a seeded random graph."""
    import random

    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    shallow = {r.v: r.label for r in duplicate_components(pairs).collect()}
    deep = {r.v: r.label for r in duplicate_components(pairs, deep=True).collect()}
    assert deep == shallow == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    rng = random.Random(7)
    rnd = [
        (rng.randrange(60), rng.randrange(60))
        for _ in range(80)
    ]
    rnd = [(a, b) for a, b in rnd if a != b]
    rdf = spark.createDataFrame(rnd, "doc_a long, doc_b long")
    shallow_r = {r.v: r.label for r in duplicate_components(rdf).collect()}
    deep_r = {r.v: r.label for r in duplicate_components(rdf, deep=True).collect()}
    assert deep_r == shallow_r


@pytest.mark.soak
def test_star_components_converge_on_deep_path_graph(spark):
    """A 1,000-node path needs ~999 hash-min rounds (diameter-bound);
    large-star/small-star must collapse it to the single component
    labeled 0 within 20 rounds (~2·log2 n) — the adversarial-depth case
    the deep=True flag exists for."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        duplicate_components,
    )

    n = 1000
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = {
        r.v: r.label
        for r in duplicate_components(path, deep=True, max_iter=20).collect()
    }
    assert len(labels) == n
    assert set(labels.values()) == {0}


@pytest.mark.soak
def test_stratified_sample_two_phase_equals_direct_rank(spark):
    """The md5-prefix pre-filter must not change WHICH rows are chosen:
    on a skewed corpus (one 400-row stratum, one 6-row stratum) the
    two-phase result equals a direct md5 rank per stratum, quotas are
    enforced on the fat stratum, and the thin stratum is kept whole."""
    import hashlib

    from flinkecuserbehavioranalysis_spark.operators.sampling import stratified_sample

    rows = [(f"s{0 if i < 400 else 1}", i) for i in range(406)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        (r.source, r.doc_id): r.rk
        for r in stratified_sample(df, ["source"], quota=5, key="doc_id").collect()
    }

    expect = {}
    for s in ("s0", "s1"):
        ids = [i for src, i in rows if src == s]
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rk, i in enumerate(ranked[:5], start=1):
            expect[(s, i)] = rk
    assert got == expect
    assert sum(1 for (s, _) in got if s == "s0") == 5
    assert sum(1 for (s, _) in got if s == "s1") == 5


def test_heavy_hitters_exact_under_eviction(spark):
    """Vocab (203 keys) far above the MG capacity (ceil(2/phi)=20) so
    per-partition summaries must evict; the exact-recount pass still
    yields exactly the keys with freq >= ceil(phi*N), matching a naive
    full count."""
    import math
    from collections import Counter

    from flinkecuserbehavioranalysis_spark.operators.skew import heavy_hitters

    rows = ["hot_a"] * 300 + ["hot_b"] * 150 + [f"cold{i}" for i in range(200) for _ in (0, 1)]
    phi = 0.1
    df = spark.createDataFrame([(t,) for t in rows], "tok string").repartition(7)
    got = {(r.tok, r.freq) for r in heavy_hitters(df, "tok", phi).collect()}
    c = Counter(rows)
    thr = math.ceil(phi * len(rows))
    expect = {(t, n) for t, n in c.items() if n >= thr}
    assert got == expect and expect  # non-vacuous


def test_canonicalize_duplicates_empty_pairs(spark):
    """A corpus with no near-dup pairs must canonicalize every doc to
    itself (the label-propagation loop sees an empty graph)."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import canonicalize_duplicates

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.canonical_id for r in canonicalize_duplicates(docs, pairs).collect()}
    assert got == {i: i for i in range(5)}


@pytest.mark.soak
def test_cosine_lsh_recall_on_planted_neardups(spark):
    """SRP-LSH is a near-dup detector: its guarantee is high recall at
    HIGH cosine (P[candidate] ≈ 1-(1-(1-θ/π)^r)^b → 0.97 at cos 0.9 for
    r=4, b=8).  The sf0.01 corpus has no true near-dups (max pairwise
    cosine 0.51), so recall is measured on planted ones: 40 base vectors
    + a small-angle perturbation of each (cos ≥ 0.95).  Asserts (a)
    recall ≥ 0.9 on the planted pairs, (b) precision 1 by construction —
    every emitted pair's cosine clears the threshold when recomputed
    naively."""
    import math
    import random

    import numpy as np

    from flinkecuserbehavioranalysis_spark.operators.similarity import cosine_lsh_pairs

    rng = random.Random(7)
    dim, n_base = 64, 40
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_base)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # perturb by ~18 degrees worth of noise: cos >= ~0.95
        pert = [x + rng.gauss(0, 0.18) * abs(x) for x in v]
        rows.append((i + n_base, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in cosine_lsh_pairs(df, threshold=0.9).collect()
    }

    V = np.array([r[1] for r in sorted(rows)], dtype=np.float64)  # index == vec_id
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    planted = {
        (i, i + n_base)
        for i in range(n_base)
        if C[i, i + n_base] >= 0.9
    }
    assert len(planted) >= 30  # the perturbation really plants near-dups
    found = planted & set(got)
    recall = len(found) / len(planted)
    print(f"cosine-LSH planted-near-dup recall@0.9: {recall:.4f} "
          f"({len(found)}/{len(planted)})")
    assert recall >= 0.9
    for (a, b), cos in got.items():
        naive = C[a, b]
        assert math.isclose(cos, round(naive, 6), abs_tol=2e-6)
        assert cos >= 0.9


def test_quantize_embeddings_roundtrip(spark):
    """int8 quantization invariants on the real embeddings: q matches the
    numpy reference exactly, every component is within [-127, 127], and
    dequantization (q * scale) reconstructs each component to within
    scale/2 (the symmetric-quantizer error bound)."""
    import numpy as np

    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    rows = {r.vec_id: (r.scale, r.q) for r in quantize_embeddings(emb).collect()}
    src = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    assert rows.keys() == src.keys()
    for vid, v in src.items():
        scale_out, q = rows[vid]
        q = np.array(q)
        sc = np.abs(v).max() / 127.0
        assert abs(scale_out - round(sc, 9)) < 1e-12
        # np.round is half-even; the operator is half-away — compare via floor(x+0.5*sign)
        ref = np.sign(v / sc) * np.floor(np.abs(v / sc) + 0.5)
        assert (q == ref.astype(int)).all()
        assert q.max() <= 127 and q.min() >= -127
        assert (np.abs(v - q * sc) <= sc / 2 + 1e-12).all()


def test_repetition_stats_known_values(spark):
    """Hand-computed repetition signals, including the n<2 edge cases."""
    from flinkecuserbehavioranalysis_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # top=3/4, adj=2/3, bigrams: [a a, a a, a b] -> dup 1/3
            (2, "x y x y"),          # all distinct-adjacent; bigrams x y, y x, x y -> dup 1/3
            (3, "solo"),             # n=1: ratios 0 except distinct=1
            (4, "  spaced   out  "), # empties filtered -> 2 tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1.n_tokens == 4
    assert r1.distinct_token_ratio == 0.5
    assert r1.top_token_share == 0.75
    assert r1.adjacent_repeat_ratio == round(2 / 3, 6)
    assert r1.dup_bigram_ratio == round(1 - 2 / 3, 6)
    r2 = out[2]
    assert r2.top_token_share == 0.5 and r2.adjacent_repeat_ratio == 0.0
    assert r2.dup_bigram_ratio == round(1 - 2 / 3, 6)
    r3 = out[3]
    assert r3.n_tokens == 1 and r3.distinct_token_ratio == 1.0
    assert r3.top_token_share == 1.0
    assert r3.adjacent_repeat_ratio == 0.0 and r3.dup_bigram_ratio == 0.0
    r4 = out[4]
    assert r4.n_tokens == 2 and r4.distinct_token_ratio == 1.0


def test_pii_scan_detects_and_redacts(spark):
    """Real PII shapes (the synthetic corpus has none): emails, URLs and
    long digit runs are counted and masked; masking order prevents an
    email's digits from double-counting as a digit run."""
    from flinkecuserbehavioranalysis_spark.operators.text import pii_scan

    rows = [
        (1, "contact bob99@example.com or visit https://ex.org/x?id=42 now"),
        (2, "call 5551234567 twice: 5551234567"),
        (3, "clean text with no sensitive content"),
        (4, "edge a@b.io 7 77"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    out = {r.id: r for r in pii_scan(df, "id", "body").collect()}
    r1 = out[1]
    assert (r1.n_email, r1.n_url) == (1, 1)
    # bob99's digits and the URL's ?id=42 are inside already-masked
    # matches — counting on the progressively-redacted text sees neither
    assert r1.n_digit_run == 0
    assert "bob99@example.com" not in r1.redacted and "https://" not in r1.redacted
    assert r1.redacted == "contact <PII> or visit <PII> now"
    r2 = out[2]
    assert r2.n_digit_run == 2 and r2.redacted == "call <PII> twice: <PII>"
    r3 = out[3]
    assert (r3.n_email, r3.n_url, r3.n_digit_run) == (0, 0, 0)
    assert r3.redacted_len == len(rows[2][1])
    r4 = out[4]
    # single digit '7' is not a run; '77' is; the email is masked first
    assert r4.n_email == 1 and r4.n_digit_run == 1
    assert r4.redacted == "edge <PII> 7 <PII>"


def test_ngram_contamination_planted_overlap(spark):
    """A corpus doc sharing a planted 3-gram window with a benchmark doc
    is flagged with the exact distinct-overlap count; clean docs are not
    emitted; min_overlap thresholds."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the 6 shingles of "quick brown fox jumps over the lazy dog"... compute exactly below
            (1, "a quick brown fox jumps away"),
            (2, "totally unrelated words here only"),
            (3, "over the lazy dog sleeps"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_contamination(corpus, bench, min_overlap=1).collect()}
    # doc 1 shingles: {a quick brown, quick brown fox, brown fox jumps, fox jumps away}
    # shared: quick brown fox, brown fox jumps -> 2
    assert out[1].n_overlap == 2 and out[1].n_grams == 4
    assert out[1].overlap_share == 0.5
    # doc 3: {over the lazy, the lazy dog, lazy dog sleeps} -> shared 2
    assert out[3].n_overlap == 2 and out[3].n_grams == 3
    assert 2 not in out
    strict = ngram_contamination(corpus, bench, min_overlap=3).collect()
    assert strict == []


def test_retention_cohorts_triangle(spark):
    """Hand-built two-cohort fixture: offsets anchor at each user's own
    first day and offset 0 equals cohort size."""
    import datetime as dt

    from flinkecuserbehavioranalysis_spark.operators.sessions import retention_cohorts

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (1, d(1)), (1, d(1, 5)), (1, d(2)), (1, d(4)),
        (2, d(1)), (2, d(2)),
        (3, d(2)), (3, d(4)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_day.isoformat(), r.day_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,  # users 1,2
        ("2024-01-01", 1): 2,  # both active day 2
        ("2024-01-01", 3): 1,  # user 1 on day 4
        ("2024-01-02", 0): 1,  # user 3
        ("2024-01-02", 2): 1,  # user 3 on day 4
    }


@pytest.mark.soak
def test_kmeans_cluster_stats_matches_naive_lloyd(spark):
    """kmeans_cluster_stats against a naive numpy replay of the same
    deterministic algorithm (smallest-id seeds, 6dp-rounded cosine
    argmax with lowest-id ties, per-dim means rounded to 6dp): cluster
    assignments and sizes must agree exactly, avg_cos to 1e-9."""
    import numpy as np

    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        kmeans_cluster_stats,
        kmeans_fit,
        _pack,
        _best_cell_scored,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    k, iters = 4, 2
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect())
    )
    ids = np.array([i for i, _ in rows])
    X = np.stack([v for _, v in rows])
    cents = X[:k].copy()

    def assign(C):
        cos = X @ C.T / (
            np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
        )
        cos = np.round(cos, 6)
        # argmax with lowest-index tiebreak (np.argmax already keeps first)
        return cos.argmax(axis=1), cos.max(axis=1)

    for _ in range(iters):
        a, _ = assign(cents)
        cents = np.stack(
            [np.round(X[a == c].mean(axis=0), 6) for c in range(k)]
        )  # seeds are distinct vectors -> no empty cell in this fixture
    a, c = assign(cents)

    out = {
        r.cluster_id: r
        for r in kmeans_cluster_stats(emb, n_cells=k, train_iters=iters).collect()
    }
    # spark cluster ids are seed vec_ids = the k smallest ids, in id order
    sizes = {int(ids[j]): int((a == j).sum()) for j in range(k)}
    assert {cid: r.n_vecs for cid, r in out.items()} == sizes
    for j in range(k):
        cid = int(ids[j])
        assert abs(out[cid].avg_cos - round(float(np.mean(c[a == j])), 6)) < 1e-5


def test_containment_catches_quoted_subset(spark):
    """A short doc fully quoted inside a long one: Jaccard is small but
    containment is 1.0 — the asymmetric metric finds what Jaccard
    can't."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler.replace("w", "z"))],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment == 1.0 and r.containment_a == 1.0 and r.containment_b < 0.1
    # the same pair is invisible to Jaccard at any usable threshold
    assert ngram_jaccard_pairs(docs, threshold=0.5).collect() == []


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking invariants: every character of every doc appears in at
    least one chunk, consecutive chunks overlap by exactly `overlap`
    (except a possibly-shorter final chunk), short docs yield one
    chunk, and reassembling chunk starts reconstructs the text."""
    from flinkecuserbehavioranalysis_spark.operators.sampling import chunk_documents

    texts = {1: "x" * 199, 2: "".join(chr(97 + i % 26) for i in range(450)), 3: "", 4: "y" * 200}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = chunk_documents(docs, chunk_chars=200, overlap=50).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_len == 199
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_len == 0
    assert len(by_doc[4]) == 1
    c2 = sorted(by_doc[2], key=lambda r: r.chunk_idx)
    # stride 150: starts 1, 151, 301; covers 450 chars
    assert [r.chunk_start for r in c2] == [1, 151, 301]
    assert [r.chunk_len for r in c2] == [200, 200, 150]
    # overlap: last 50 chars of chunk i == first 50 of chunk i+1
    for a, b in zip(c2, c2[1:]):
        assert a.chunk_text[-50:] == b.chunk_text[:50]
    # reconstruction from strides
    rebuilt = c2[0].chunk_text + "".join(r.chunk_text[50:] for r in c2[1:])
    assert rebuilt == texts[2]


def test_quantized_topk_recall_vs_float_baseline(spark):
    """int8-quantized exact search must agree closely with the float
    baseline: recall@10 >= 0.9 averaged over the query set (int8 only
    perturbs near-ties)."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in brute_force_topk(emb, qs, k=10).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    quant = {}
    for r in quantized_topk(emb, qs, k=10).collect():
        quant.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_quantized_recall_floor(spark):
    """The composed IVF+int8 index keeps recall@10 >= 0.7 vs the float
    brute force at n_cells=8/nprobe=3 — the compounded probe + int8
    loss stays within the documented floor."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_quantized_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in brute_force_topk(emb, qs, k=10).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ivf_quantized_topk(
        emb, qs, n_cells=8, nprobe=3, k=10, train_iters=2, corpus_probes=2,
        train_fraction=0.5,
    ).collect():
        approx.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_topk_recall_floor(spark):
    """PQ/ADC search must keep recall@10 >= 0.6 vs the float brute
    force at m=32/k=32 (reconstruction error only perturbs ranks) —
    the documented floor for the registered parameterization."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in brute_force_topk(emb, qs, k=10).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    approx = {}
    for r in pq_topk(
        emb, qs, dim=64, m=32, k_codes=32, k=10, train_fraction=0.5
    ).collect():
        approx.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


@pytest.mark.soak
def test_ivf_pq_recall_floor(spark):
    """The composed IVF+PQ index keeps recall@10 >= 0.5 vs the float
    brute force (coarse-probe loss compounds with PQ reconstruction) —
    the registered ann_ivf_pq_topk parameterization."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in brute_force_topk(emb, qs, k=10).collect():
        exact.setdefault(r.q_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ivf_pq_topk(
        emb, qs, dim=64, m=32, k_codes=32, n_cells=8, nprobe=3,
        corpus_probes=2, k=10, train_fraction=0.5,
    ).collect():
        approx.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


@pytest.mark.soak
def test_pq_encode_reconstruction_properties(spark):
    """PQ encode invariants on a tiny hand corpus: codes are 1-based
    dense ranks bounded by k', xn2 equals the integer sum of the chosen
    centroids' quantized self-dots, and a vector equal to a trained
    centroid reconstruction scores cosine 1.0 against itself via ADC."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    rows = [(i, [float(i % 4), float((i * 7) % 5), float(i % 3), float((i * 3) % 4)]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = pq_fit(df, dim=4, m=2, k=4, train_iters=2)
    brows = book.collect()
    by_m = {}
    for r in brows:
        by_m.setdefault(r.m_idx, []).append(r)
    assert set(by_m) == {0, 1}
    for mi, entries in by_m.items():
        codes = sorted(e.code for e in entries)
        assert codes == list(range(1, len(codes) + 1))  # dense 1-based
    enc = {r.vec_id: r for r in pq_encode(df, book, dim=4, m=2).collect()}
    assert len(enc) == 24
    import math

    cmap = {(r.m_idx, r.code): list(r.c_vec) for r in brows}
    for r in enc.values():
        assert len(r.codes) == 2
        xn2 = 0
        for mi, code in enumerate(r.codes):
            assert 1 <= code <= len(by_m[mi])
            cv = cmap[(mi, code)]
            acc = cv[0] * cv[0]
            for x in cv[1:]:
                acc = acc + x * x
            y = acc * 1e6
            xn2 += int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))
        assert xn2 == r.xn2
    # self-query through the full ADC path ranks deterministically
    out = pq_topk(df, df.filter(F.col("vec_id") < 2), dim=4, m=2, k_codes=4, k=5)
    got = out.collect()
    assert {r.q_id for r in got} == {0, 1}
    for q in (0, 1):
        rnks = sorted(r.rnk for r in got if r.q_id == q)
        assert rnks == list(range(1, len(rnks) + 1))


def test_hashed_vectorize_matches_python(spark):
    """Full-array equality of the hashing-trick vectors against a pure
    Python replay (md5-bucket per token, histogram, l2 norm)."""
    import hashlib
    import math

    from flinkecuserbehavioranalysis_spark.operators.text import hashed_vectorize

    docs = spark.createDataFrame(
        [(1, "spark hash spark window"), (2, ""), (3, "  a  b a ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (list(r.vec), r.l2_norm) for r in hashed_vectorize(docs, dim=8).collect()}
    for i, text in [(1, "spark hash spark window"), (2, ""), (3, "  a  b a ")]:
        vec = [0] * 8
        for w in [w for w in text.split(" ") if w]:
            vec[int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 8] += 1
        assert got[i][0] == vec
        assert abs(got[i][1] - round(math.sqrt(sum(x * x for x in vec)), 6)) < 1e-12


def test_weighted_hash_sample_bias_and_determinism(spark):
    """Weight-proportional sampling: heavier rows keep more often (rate
    ratio tracks the weight ratio), max-weight rows keep at ~fraction,
    and the decision is deterministic across runs."""
    from flinkecuserbehavioranalysis_spark.operators.sampling import (
        weighted_hash_sample,
    )

    rows = [(i, 10 if i % 2 == 0 else 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, w long")
    kept = [tuple(r) for r in weighted_hash_sample(df, "k", F.col("w"), 0.5).collect()]
    kept2 = [tuple(r) for r in weighted_hash_sample(df, "k", F.col("w"), 0.5).collect()]
    assert sorted(kept) == sorted(kept2)
    light = sum(1 for _, w in kept if w == 10) / 1000
    heavy = sum(1 for _, w in kept if w == 100) / 1000
    assert abs(heavy - 0.5) < 0.06          # max-weight rows keep at ~fraction
    assert abs(light - 0.05) < 0.03         # 10x lighter -> ~10x rarer


def test_weighted_hash_sample_degenerate_weights(spark):
    """max(weight) <= 0 on a non-empty input fails fast instead of
    silently returning an empty sample; an empty input stays an empty
    (errorless) output; negative-weight rows are never kept."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from flinkecuserbehavioranalysis_spark.operators.sampling import (
        weighted_hash_sample,
    )

    zero = spark.createDataFrame([(1, 0), (2, -5)], "k long, w long")
    with pytest.raises((Py4JJavaError, PySparkException)) as exc:
        weighted_hash_sample(zero, "k", F.col("w"), 0.5).collect()
    assert "weights must be positive" in str(exc.value)

    empty = spark.createDataFrame([], "k long, w long")
    assert weighted_hash_sample(empty, "k", F.col("w"), 0.5).collect() == []

    mixed = spark.createDataFrame(
        [(i, -7 if i % 2 else 100) for i in range(200)], "k long, w long"
    )
    kept = weighted_hash_sample(mixed, "k", F.col("w"), 0.5).collect()
    assert kept and all(r.w > 0 for r in kept)


@pytest.mark.soak
def test_build_vocab_sharded_path_matches_single_stage(spark):
    """Forcing the auto-shard global-rank path (single_stage_cap below
    max_size) must reproduce the single-stage path's (token, cnt,
    vocab_id) rows exactly, including the max_size truncation and the
    (cnt desc, token asc) tie order."""
    from flinkecuserbehavioranalysis_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [
            (1, "b b b a a c d e f g"),
            (2, "a c c d d e f g h i"),
            (3, "j k l m n o p q r s"),
            (4, "a b c"),
        ],
        "doc_id long, text string",
    )
    single = {
        (r.token, r.cnt, r.vocab_id)
        for r in build_vocab(docs, max_size=12).collect()
    }
    sharded = {
        (r.token, r.cnt, r.vocab_id)
        for r in build_vocab(
            docs, max_size=12, single_stage_cap=2, shards=4
        ).collect()
    }
    assert sharded == single
    assert len(single) == 12
    # determinism of the sharded path across runs
    again = {
        (r.token, r.cnt, r.vocab_id)
        for r in build_vocab(
            docs, max_size=12, single_stage_cap=2, shards=4
        ).collect()
    }
    assert again == sharded


def test_quantized_topk_query_outside_corpus(spark):
    """A query vector whose id is NOT in the corpus still gets ranked
    neighbors (queries' own vectors are quantized — no corpus join to
    silently drop absent ids), and scores match an in-corpus twin with
    the same vector."""
    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        quantized_topk,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.6]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    outside = spark.createDataFrame(
        [(99, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = quantized_topk(corpus, outside, k=3).collect()
    assert {r.q_id for r in got} == {99}
    by_rank = sorted(got, key=lambda r: r.rnk)
    assert [r.neighbor_id for r in by_rank] == [1, 2, 3]
    # identical vector, in-corpus id → identical neighbor scores
    inside = quantized_topk(corpus, corpus.filter(F.col("vec_id") == 1), k=3).collect()
    ref = {r.neighbor_id: r.cos for r in inside}
    for r in got:
        if r.neighbor_id in ref:
            assert r.cos == ref[r.neighbor_id]


def test_repeated_gram_stats_span_semantics(spark):
    """Every doc gets a row; a window counts as duplicated only when it
    appears in >= min_docs DISTINCT docs (within-doc repetition alone
    never qualifies); n_dup_grams counts positions, not distinct grams;
    short docs report 0/0.0."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        repeated_gram_hotlist,
        repeated_gram_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),            # grams: abc bcd cde
            (2, "a b c a b c d"),        # abc bca cab abc bcd — 'a b c' twice
            (3, "q r s t"),              # unique grams
            (4, "u v"),                  # shorter than w -> 0 grams
            (5, "m n o p m n o"),        # 'm n o' twice but only this doc
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repeated_gram_stats(docs, w=3).collect()}
    assert len(out) == 5
    assert (out[1].n_grams, out[1].n_dup_grams) == (3, 2)
    assert out[1].dup_share == 2 / 3
    # doc 2: positions 'a b c' x2 + 'b c d' x1 are cross-doc duplicated
    assert (out[2].n_grams, out[2].n_dup_grams) == (5, 3)
    assert out[2].dup_share == 0.6
    assert (out[3].n_grams, out[3].n_dup_grams) == (2, 0)
    assert (out[4].n_grams, out[4].n_dup_grams, out[4].dup_share) == (0, 0, 0.0)
    # within-doc repetition does not make a gram "duplicated"
    assert (out[5].n_grams, out[5].n_dup_grams) == (5, 0)

    hot = repeated_gram_hotlist(docs, w=3).collect()
    assert [(r.gram, r.df, r.n_occ) for r in hot] == [
        ("a b c", 2, 3),
        ("b c d", 2, 2),
    ]


def test_semantic_dedup_flags_planted_duplicates(spark):
    """SemDeDup on planted semantic duplicates: base vectors + a
    small-angle perturbation of each (cos >= ~0.95) must flag exactly
    the HIGHER id of each planted pair (keep-first-by-id), clusters
    keep base and perturbation together, and clean vectors pass."""
    import random

    import numpy as np

    from flinkecuserbehavioranalysis_spark.operators.similarity import semantic_dedup

    rng = random.Random(11)
    dim, n_base = 16, 20
    rows = []
    for i in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in v]))
        pert = [x + rng.gauss(0, 0.15) * abs(x) for x in v]
        rows.append((i + n_base, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(df, n_cells=4, train_iters=2, tau=0.9).collect()}
    assert len(out) == 2 * n_base

    V = np.array([r[1] for r in sorted(rows)], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    # which planted pairs truly clear tau AND share a cluster (k-means
    # blocking can split a pair across cluster boundaries — SemDeDup's
    # documented recall trade; flags must match the blocked semantics)
    for i in range(n_base):
        j = i + n_base
        same_cluster = out[i].cluster_id == out[j].cluster_id
        if same_cluster and round(C[i, j], 6) >= 0.9:
            assert out[j].is_semdup == 1, (i, j, C[i, j])
            assert out[j].best_prior_cos is not None
            assert out[i].is_semdup in (0, 1)  # base may match another base
    # a flagged vector always has a qualifying prior mate recomputable naively
    for vid, r in out.items():
        if r.is_semdup:
            mates = [
                u for u in out
                if u < vid and out[u].cluster_id == r.cluster_id
                and round(C[u, vid], 6) >= 0.9
            ]
            assert mates, vid
            assert round(max(round(C[u, vid], 6) for u in mates), 6) == round(
                r.best_prior_cos, 6
            )
        else:
            assert r.best_prior_cos is None


def test_write_partitioned_prunes_and_overwrites_dynamically(spark, tmp_path):
    """Partitioned layout round-trip: (a) a filter on the partition
    column shows up as PartitionFilters on the scan (directory pruning,
    not row filtering), (b) values survive the round-trip, (c) dynamic
    overwrite replaces ONLY the partitions present in the new frame."""
    import contextlib
    import io as _io

    from flinkecuserbehavioranalysis_spark.io import write_partitioned

    path = str(tmp_path / "part_events")
    df = spark.createDataFrame(
        [(1, "view", 10.0), (2, "view", 11.0), (3, "click", 12.0), (4, "error", 13.0)],
        "event_id long, event_type string, value double",
    )
    write_partitioned(df, path, ["event_type"])
    back = spark.read.parquet(path)
    assert back.count() == 4

    pruned = back.filter(F.col("event_type") == "view")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("\n")[0]
    assert {r.event_id for r in pruned.collect()} == {1, 2}

    # dynamic overwrite: rewrite only the 'click' partition
    write_partitioned(
        spark.createDataFrame([(30, "click", 99.0)], "event_id long, event_type string, value double"),
        path,
        ["event_type"],
    )
    after = {r.event_id for r in spark.read.parquet(path).collect()}
    assert after == {1, 2, 4, 30}

    # idempotency: retrying the same backfill twice duplicates nothing
    retry = spark.createDataFrame(
        [(30, "click", 99.0)], "event_id long, event_type string, value double"
    )
    write_partitioned(retry, path, ["event_type"])
    write_partitioned(retry, path, ["event_type"])
    assert {r.event_id for r in spark.read.parquet(path).collect()} == {1, 2, 4, 30}


def test_weekly_sketch_uv_within_tolerance(spark):
    """Unioned per-day HLL sketches must estimate weekly UV within the
    sketch's error envelope of the exact distinct count (the
    store-sketches-not-events pattern)."""
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    est = {
        r.week: r.uv_est
        for r in QUERIES["weekly_uv_from_daily_sketches"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    day = F.floor(F.col("ts").cast("long") / F.lit(86400)).cast("long")
    week = F.floor(day / F.lit(7)).cast("long")
    exact = {
        r.week: r.uv
        for r in ev.groupBy(week.alias("week"))
        .agg(F.countDistinct("user_id").alias("uv"))
        .collect()
    }
    assert set(est) == set(exact)
    for wk, e in est.items():
        assert abs(e - exact[wk]) <= max(2, 0.05 * exact[wk]), (wk, e, exact[wk])


def test_python_datasource_batch_partitions_pushdown(spark):
    """Custom Python Data Source (Spark 4 API): deterministic synthetic
    LoginLog rows, read across 4 planned partitions; an event_type
    equality filter is PUSHED INTO the Python reader (absorbed by the
    generator, visible as PushedFilters on the scan) and the result
    matches the unpushed recomputation."""
    import contextlib
    import io as _io

    from flinkecuserbehavioranalysis_spark.session import apply_runtime_confs
    from flinkecuserbehavioranalysis_spark.sources.pydatasource import (
        LoginLogDataSource,
        _row,
    )

    apply_runtime_confs(spark)
    spark.dataSource.register(LoginLogDataSource)
    df = spark.read.format("loginlog_synth").option("n_rows", 500).option("seed", 7).load()
    assert dict(df.dtypes) == {
        "user_id": "bigint", "ip": "string", "event_type": "string", "ts": "bigint"
    }
    assert df.count() == 500 and df.rdd.getNumPartitions() == 4
    expect = [_row(i, 7, 100) for i in range(500)]
    assert sorted(tuple(r) for r in df.collect()) == sorted(expect)

    fails = df.filter(F.col("event_type") == "fail")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        fails.explain("formatted")
    assert "PushedFilters: [EqualTo(event_type,fail)]" in buf.getvalue()
    assert sorted(tuple(r) for r in fails.collect()) == sorted(
        r for r in expect if r[2] == "fail"
    )


def test_python_datasource_stream_offsets(spark):
    """The stream reader's offset contract: an availableNow run takes
    one offset range [0, rows_per_batch) and replays it exactly —
    contiguous, deterministic rows from offset 0 (no polling, immune
    to scheduler load)."""
    from flinkecuserbehavioranalysis_spark.sources.pydatasource import (
        LoginLogDataSource,
        _row,
    )

    spark.dataSource.register(LoginLogDataSource)
    stream = (
        spark.readStream.format("loginlog_synth")
        .option("rows_per_batch", 50)
        .option("seed", 3)
        .load()
    )
    sink: list = []
    q = (
        stream.writeStream.foreachBatch(lambda df, eid: sink.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(sink) >= 50
    got = sorted(tuple(r) for r in sink)[:50]
    assert got == sorted(_row(i, 3, 100) for i in range(50))


def test_udtf_chunking_matches_generator_operator(spark):
    """§2.10 UDTF surface: the Python UDTF chunker emits EXACTLY the
    rows of the Catalyst-generator chunk_documents on the documents
    table (lateral-join invocation) — two implementations, one
    contract."""
    from pyspark.sql.functions import lit, udtf

    from flinkecuserbehavioranalysis_spark.functions.udtfs import (
        CHUNK_SCHEMA_DDL,
        ChunkDocument,
    )
    from flinkecuserbehavioranalysis_spark.operators.sampling import chunk_documents

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    chunker = udtf(ChunkDocument, returnType=CHUNK_SCHEMA_DDL)
    spark.udtf.register("chunk_doc", chunker)
    docs.createOrReplaceTempView("__udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_start, c.chunk_len, c.chunk_text "
        "FROM __udtf_docs d, LATERAL chunk_doc(d.text, 80, 20) c"
    )
    expect = chunk_documents(docs, chunk_chars=80, overlap=20)
    key = lambda r: (r[0], r[1])  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, expect.collect()), key=key
    )
    assert got.count() > 50


def test_observation_metrics_on_corpus_scan(spark):
    """Pipeline observability: df.observe() attaches data-quality
    counters (rows, quality-passed, null texts) that come back with the
    SAME action that produced the result — no second scan, the metric
    hook a 100 TB ingest job publishes per batch."""
    from pyspark.sql import Observation

    from flinkecuserbehavioranalysis_spark.operators.text import quality_ok

    docs = load_table(spark, SF_DIR, "documents")
    obs = Observation("corpus_quality")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(quality_ok("text").cast("long")).alias("n_quality"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
    )
    n = observed.filter(quality_ok("text")).count()
    m = obs.get
    assert m["n_rows"] == docs.count()
    assert m["n_quality"] == n
    assert m["n_null_text"] == 0


def test_ivf_index_save_load_roundtrip(spark, tmp_path):
    """Index lifecycle: build → save (postings partitioned by cell) →
    load → query gives BIT-IDENTICAL results to the in-session
    ivf_topk, and the postings directory is cell-partitioned."""
    import os

    from flinkecuserbehavioranalysis_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        load_ivf_index,
        query_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(n_cells=8, train_iters=2, corpus_probes=2)
    direct = sorted(
        tuple(r) for r in ivf_topk(emb, queries, nprobe=3, k=10, **kw).collect()
    )
    seeds, assigned = build_ivf_index(emb, **kw)
    path = str(tmp_path / "ivf")
    save_ivf_index(seeds, assigned, path)
    assert any(d.startswith("cell=") for d in os.listdir(path + "/postings"))
    ls, la = load_ivf_index(spark, path)
    loaded = sorted(
        tuple(r) for r in query_ivf_index(ls, la, queries, nprobe=3, k=10).collect()
    )
    assert loaded == direct and len(loaded) == 50


def test_read_csv_events_tolerates_malformed_rows(spark, tmp_path):
    """Ingest robustness: PERMISSIVE mode lands malformed rows as
    null-padded records instead of failing the job (a crawler feed
    always has bad lines); well-formed rows parse untouched, and the
    null timestamp is filterable downstream."""
    from flinkecuserbehavioranalysis_spark.io import read_csv_events
    from flinkecuserbehavioranalysis_spark.schemas import LOGIN_EVENT

    p = tmp_path / "dirty.csv"
    p.write_text(
        "7,86.226.1.5,success,1600000000\n"
        "not,a,valid,row,extra,columns\n"
        "8,92.1.2.3,fail,not_a_number\n"
        "9,10.0.0.1,success,1600000100\n"
    )
    df = read_csv_events(spark, str(p), LOGIN_EVENT)
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped silently
    good = df.filter(F.col("ts").isNotNull())
    assert {r.user_id for r in good.collect()} >= {7, 9}
    # the numeric-garbage timestamp parses to null, not a crash
    bad_ts = df.filter(F.col("ts").isNull()).count()
    assert bad_ts >= 1


def test_simhash_hamming_pairs_pigeonhole_recall(spark):
    """Manku banding must have PERFECT recall within the pigeonhole
    bound: every pair whose full-signature Hamming distance <= bands-1
    is emitted (verified by recomputing all-pairs distances naively),
    and nothing above max_hamming leaks through."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        simhash,
        simhash_hamming_pairs,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    bits, bands, mh = 32, 4, 3
    sigs = {r.doc_id: r.simhash for r in simhash(docs, bits=bits).collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(docs, bits=bits, bands=bands, max_hamming=mh).collect()
    }
    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if d <= mh:
                expect[(a, b)] = d
    assert got == expect


def test_incremental_dedup_flags_planted_cross_dup(spark):
    """A new-batch doc that duplicates a base doc is flagged with
    jaccard 1.0; a novel doc passes with zero candidates; base docs
    never appear in the output."""
    from flinkecuserbehavioranalysis_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
         (101, "totally novel words nothing shared here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup_flags(new, base).collect()}
    assert set(out) == {100, 101}
    assert out[100].is_dup == 1 and out[100].best_jaccard == 1.0
    assert out[100].n_candidates >= 1
    assert out[101].is_dup == 0 and out[101].best_jaccard is None
    assert out[101].n_candidates == 0


def test_weekly_uv_sketch_within_tolerance_of_exact_twin(spark):
    """weekly_uv_from_daily_sketches (rows-only: Datasketches HLL union)
    vs its oracle-exact sibling weekly_uv_exact — estimates must land
    within HLL tolerance of the exact weekly distinct counts
    (driver-rotation insurance, round-4 verdict ask #8)."""
    from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {
        r.week: r.uv for r in QUERIES["weekly_uv_exact"].fn(spark, sf).collect()
    }
    est = {
        r.week: r.uv_est
        for r in QUERIES["weekly_uv_from_daily_sketches"].fn(spark, sf).collect()
    }
    assert set(exact) == set(est)
    assert len(exact) > 0
    for wk, ex in exact.items():
        assert abs(est[wk] - ex) <= max(3, 0.05 * ex), (wk, ex, est[wk])


@pytest.mark.soak
def test_aqe_skew_join_split_triggers_and_its_limits(spark):
    """The 100 TB skew insurance policy, pinned at bench scale:

    (a) AQE splits a genuinely skewed sort-merge join when both join
        children are plain shuffle reads (thresholds scaled to this
        container's data — defaults are 256 MB, sized for clusters);
    (b) the SAME skew with an aggregation under one join child is NOT
        split (OptimizeSkewedJoin pattern-matches direct shuffle reads
        only) — the case operators/skew.salted_join exists for.
    """
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 600_000).select(
            F.when(F.col("id") % 10 < 6, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pay"),
        )
        small_plain = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("tag")
        )

        def final_plan(df):
            df.collect()
            return (
                df._jdf.queryExecution().executedPlan().finalPhysicalPlan().toString()
            )

        plan_a = final_plan(big.join(small_plain, "k").select("k", "pay"))
        assert "skew=true" in plan_a, "AQE did not split the skewed join"

        small_agged = (
            spark.range(0, 50_000)
            .select((F.col("id") % 25_000).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("tag"))
        )
        plan_b = final_plan(big.join(small_agged, "k").select("k", "pay"))
        assert "skew=true" not in plan_b, (
            "AQE now splits joins over aggregated children — revisit whether "
            "salted_join is still needed for this shape"
        )
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)

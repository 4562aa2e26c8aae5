"""Every registered query with a SQL oracle must match DuckDB exactly
(the driver's t2 correctness gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from flinkecuserbehavioranalysis_spark.plans.queries import QUERIES

from conftest import assert_matches_oracle

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)

#: Fast-tier oracle subset (round-9 verdict #3): the 17 reference jobs
#: plus one representative per extension family — enough to catch a
#: broken shared helper (io, scalar twins, fixedpoint, window SQL
#: builders) in the dev loop.  The FULL sweep runs in the soak tier and
#: in scripts/verify.py (the per-round gate), so nothing loses coverage.
FAST_ORACLE_SUBSET = [
    # reference parity
    "page_view_count", "hot_items_topn", "top_urls", "unique_visitors",
    "ad_clicks_by_province", "ad_blacklist_warnings", "ad_blacklist_passed",
    "app_marketing_by_channel", "app_marketing_total", "login_fail_detect",
    "pattern_view_then_purchase", "order_fulfillment_status", "tx_match",
    "interval_join_shipments", "sessionize_users", "pricing_summary",
    "region_revenue", "top_revenue_customers",
    # one per extension family
    "dedup_exact", "dedup_minhash_lsh", "dedup_components",
    "dedup_prefix_jaccard", "dedup_url_canonical", "ann_brute_force_topk",
    "embedding_label_centroids", "text_token_stats", "text_quality",
    "multimodal_decode_meta", "windowed_value_quantiles",
    "event_last_order_asof", "bpe_learn_merges", "heavy_hitter_provinces",
    "fuzzy_part_name_pairs", "quality_perceptron_flags",
    "corpus_temperature_mix", "item_cooccurrence_similarity",
    "doc_quality_gopher_rules", "docs_paragraph_dedup",
    "corpus_contamination_ngram_overlap", "reservoir_sample_documents",
    "domain_quality_mix_report", "token_ngram_perplexity",
    "events_sessionized_stats", "doc_token_entropy", "corpus_dsir_weights",
    "token_zipf_fit", "streaming_cep_replay", "streaming_funnel_replay",
]


@pytest.mark.parametrize(
    "name", [n for n in FAST_ORACLE_SUBSET if n in ORACLE_QUERIES]
)
def test_query_matches_oracle_fast(spark, ddb, name):
    assert_matches_oracle(spark, ddb, QUERIES[name])


@pytest.mark.soak
@pytest.mark.parametrize(
    "name", [n for n in ORACLE_QUERIES if n not in set(FAST_ORACLE_SUBSET)]
)
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
    # _DEFER_PAST_R9 / _DEFER_PAST_R10 names sort as if checked in
    # their round while no record of that round exists (round-8 verdict
    # #2 / round-9 verdict #1: new registrations must not displace the
    # next window's never-checked + LRU composition); each set becomes
    # "never-checked" only once its round's record lands
    deferred: set[str] = set()
    if max(last.values(), default=0) < 9:
        deferred |= e._DEFER_PAST_R9
    if max(last.values(), default=0) < 10:
        deferred |= e._DEFER_PAST_R10
    if max(last.values(), default=0) < 11:
        deferred |= e._DEFER_PAST_R11
    never = [n for n in order if n not in last and n not in deferred]
    if never:
        # every never-checked name precedes every checked name
        first_checked = min(order.index(n) for n in last) if last else len(order)
        assert max(order.index(n) for n in never) < first_checked
        # deferred names sort BEHIND every checked name (the very back)
        for n in deferred:
            if n in QUERIES:
                assert order.index(n) > first_checked
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


def test_rotation_deferral_self_retires_once_its_record_lands(tmp_path):
    """For the HIGHEST deferral round N (the active ``_DEFER_PAST_RN``
    set), the deferred names must sort LAST while no round-N record
    exists, then jump to the FRONT of the next window the moment a
    CORRECTNESS_rN.json lands — the self-retirement the whole deferral
    ledger depends on.  The pre-record phase is CONSTRUCTED, not
    assumed from repo state: only records for rounds < N are copied
    into the scratch dir, so the test stays green after the driver's
    real round-N record lands in the repo root (round-10 verdict #1)."""
    import importlib.util
    import json
    import re
    import shutil
    from pathlib import Path

    import __spark_entry__ as e

    defer_sets = {
        int(m.group(1)): getattr(e, a)
        for a in dir(e)
        for m in [re.fullmatch(r"_DEFER_PAST_R(\d+)", a)]
        if m is not None
    }
    assert defer_sets, "deferral ledger disappeared — update this test"
    active_round = max(defer_sets)
    deferred = defer_sets[active_round]

    repo = Path(e.__file__).resolve().parent
    shutil.copy(repo / "__spark_entry__.py", tmp_path / "__spark_entry__.py")
    for rec in repo.glob("CORRECTNESS_r*.json"):
        rnd = int("".join(ch for ch in rec.stem if ch.isdigit()) or 0)
        if rnd < active_round:
            shutil.copy(rec, tmp_path / rec.name)

    def load_order(d):
        spec = importlib.util.spec_from_file_location(
            "entry_scratch", d / "__spark_entry__.py"
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m, m._rotation_order()

    m1, before = load_order(tmp_path)
    n_defer = len(deferred)
    # pre-record: every deferred name sits at the very back
    assert set(before[-n_defer:]) == deferred
    # land a synthetic round-N record = the current window (first 50)
    (tmp_path / f"CORRECTNESS_r{active_round}.json").write_text(
        json.dumps({n: {"hash_match": True} for n in before[:50]})
    )
    m2, after = load_order(tmp_path)
    # post-record: the deferred names are genuinely never-checked again —
    # every one sorts ahead of every name that carries ANY record from
    # ANY round (i.e. they lead the next driver window)
    recorded: set[str] = set()
    for rec in Path(tmp_path).glob("CORRECTNESS_r*.json"):
        recorded |= set(json.loads(rec.read_text()))
    first_checked = min(after.index(n) for n in after if n in recorded)
    for n in deferred:
        assert after.index(n) < first_checked, n

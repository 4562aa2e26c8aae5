"""Round-9 operators: Gopher rule battery, paragraph dedup, eval-centric
contamination, reservoir sampling, URL canonicalization, session stats,
and the Q12 fixed-point log2 / bigram-surprisal pair (hand fixtures +
cross-engine equality of the fixed-point chain)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from flinkecuserbehavioranalysis_spark.functions.fixedpoint import (
    FRAC_BITS,
    ONE_Q12,
    log2_q12_py,
    log2_q12_sql_ctes,
    with_log2_q12,
)
from flinkecuserbehavioranalysis_spark.operators.dedup import (
    canonical_url,
    contamination_report,
    paragraph_dedup_stats,
    url_dedup_groups,
)
from flinkecuserbehavioranalysis_spark.operators.sampling import reservoir_sample
from flinkecuserbehavioranalysis_spark.operators.sessions import session_stats
from flinkecuserbehavioranalysis_spark.operators.text import bigram_surprisal, gopher_rules


# --- fixed-point log2 -------------------------------------------------

_LOG2_PROBES = [
    1, 2, 3, 4, 5, 7, 8, 15, 16, 17, 255, 256, 257, 4095, 4096, 10**6,
    10**9, 10**12, 2**40 + 123, 2**46 + 999, 999999937,
]


def test_log2_q12_spark_matches_python_model(spark):
    df = spark.createDataFrame([(x,) for x in _LOG2_PROBES], "x long")
    got = {r.x: r.lg for r in with_log2_q12(df, "x", "lg").select("x", "lg").collect()}
    for x in _LOG2_PROBES:
        assert got[x] == log2_q12_py(x), x


def test_log2_q12_duckdb_matches_python_model():
    rows = ",".join(f"({x})" for x in _LOG2_PROBES)
    ctes = log2_q12_sql_ctes(f"(SELECT x FROM (VALUES {rows}) v(x))", ["x"], "x", "lg", "__l")
    got = dict(duckdb.sql(f"WITH {ctes} SELECT x, lg FROM __lf").fetchall())
    for x in _LOG2_PROBES:
        assert got[x] == log2_q12_py(x), x


#: wide-path probes crossing every branch boundary of the 62-bit split:
#: e <= 28 (pure lift), 28 < e < 90 (stitched halves), e >= 90 (h-only),
#: the int64 ceiling, and the 2^124 validity edge
_LOG2_WIDE_PROBES = [
    1, 2, 3, 2**28 - 1, 2**28, 2**29 + 7, 2**61 + 11, 2**62 - 1, 2**62,
    2**62 + 13, 2**63 - 1, 2**63, 2**63 + 17, 2**89 + 5, 2**90 - 1,
    2**90, 2**90 + 19, 2**100 + 12345, 2**123 + 3**50, 2**124 - 1,
]


def test_log2_q12_wide_spark_matches_python_model(spark):
    import decimal

    df = spark.createDataFrame(
        [(decimal.Decimal(x),) for x in _LOG2_WIDE_PROBES], "x decimal(38,0)"
    )
    got = {
        int(r.x): r.lg
        for r in with_log2_q12(df, "x", "lg", wide=True).select("x", "lg").collect()
    }
    for x in _LOG2_WIDE_PROBES:
        assert got[x] == log2_q12_py(x), x


def test_log2_q12_wide_agrees_with_narrow_on_shared_domain(spark):
    # the wide function must EQUAL the narrow one below 2^63 — that is
    # what lets a wide-path query reuse the narrow SQL oracle
    import decimal

    shared = [x for x in _LOG2_PROBES if x < 2**63]
    dn = spark.createDataFrame([(x,) for x in shared], "x long")
    narrow = {r.x: r.lg for r in with_log2_q12(dn, "x", "lg").collect()}
    dw = spark.createDataFrame(
        [(decimal.Decimal(x),) for x in shared], "x decimal(38,0)"
    )
    wide = {int(r.x): r.lg for r in with_log2_q12(dw, "x", "lg", wide=True).collect()}
    assert narrow == wide


def test_log2_q12_wide_duckdb_matches_python_model():
    rows = ",".join(f"(CAST('{x}' AS DECIMAL(38,0)))" for x in _LOG2_WIDE_PROBES)
    ctes = log2_q12_sql_ctes(
        f"(SELECT x FROM (VALUES {rows}) v(x))", ["x"], "x", "lg", "__w", wide=True
    )
    got = {int(x): lg for x, lg in duckdb.sql(f"WITH {ctes} SELECT x, lg FROM __wf").fetchall()}
    for x in _LOG2_WIDE_PROBES:
        assert got[x] == log2_q12_py(x), x


def test_log2_q12_accuracy_bound():
    import math

    for x in _LOG2_PROBES:
        assert abs(log2_q12_py(x) / ONE_Q12 - math.log2(x)) < 2 ** -(FRAC_BITS - 2), x


def test_bigram_surprisal_matches_hand_model(spark):
    # corpus: two docs over a 3-word vocab; model computed by hand below
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c"), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    # bigrams: d1: (a,b)x2 (b,a) (b,c); d2: (a,b) (b,c)
    # model: c(a,b)=3 c(b,a)=1 c(b,c)=2; ctx: a=3, b=3; V = |{a,b,c}| = 3
    def s(num, den):
        return log2_q12_py(den) - log2_q12_py(num)

    d1 = 2 * s(4, 6) + s(2, 6) + s(3, 6)
    d2 = s(4, 6) + s(3, 6)
    assert out[1].n_bigrams == 4 and out[2].n_bigrams == 2
    assert out[1].avg_surprisal_bits == round(d1 / 4 / float(ONE_Q12), 6)
    assert out[2].avg_surprisal_bits == round(d2 / 2 / float(ONE_Q12), 6)
    assert 3 not in out and 4 not in out  # NULL text / <2 words: no row


def test_bigram_surprisal_min_count_remaps_hapax_to_unk(spark):
    # round-9 verdict #2: tokens below min_count collapse to <unk>
    # BEFORE the model is built.  'qqq' is a hapax; a/b/c survive.
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c"), (5, "a qqq b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal(docs, min_count=2).collect()}
    # remapped bigrams: d1 (a,b)x2 (b,a) (b,c); d2 (a,b) (b,c);
    # d5 (a,<unk>) (<unk>,b).  model: c(a,b)=3 c(b,a)=1 c(b,c)=2
    # c(a,<unk>)=1 c(<unk>,b)=1; ctx: a=4 b=3 <unk>=1; V=|{a,b,c,<unk>}|=4
    def s(num, den):
        return log2_q12_py(den) - log2_q12_py(num)

    d1 = 2 * s(4, 8) + s(2, 7) + s(3, 7)
    d5 = s(2, 8) + s(2, 5)
    assert out[1].n_bigrams == 4 and out[5].n_bigrams == 2
    assert out[1].avg_surprisal_bits == round(d1 / 4 / float(ONE_Q12), 6)
    assert out[5].avg_surprisal_bits == round(d5 / 2 / float(ONE_Q12), 6)
    # min_count=1 disables the remap: 'qqq' stays a first-class token
    raw = {r.doc_id: r for r in bigram_surprisal(docs, min_count=1).collect()}
    # raw model: c(a,qqq)=1 c(qqq,b)=1 instead of the <unk> rows;
    # ctx a=4 b=3 qqq=1; V=|{a,b,c,qqq}|=4 — same arithmetic, no collapse
    assert raw[5].avg_surprisal_bits == out[5].avg_surprisal_bits
    # but a corpus with TWO distinct hapaxes separates the variants:
    docs2 = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c"), (5, "a qqq b"), (6, "a zzz b")],
        "doc_id long, text string",
    )
    pruned = {r.doc_id: r for r in bigram_surprisal(docs2, min_count=2).collect()}
    raw2 = {r.doc_id: r for r in bigram_surprisal(docs2, min_count=1).collect()}
    # pruned: qqq and zzz SHARE the <unk> rows (c(a,<unk>)=2, c(<unk>,b)=2)
    # raw: four distinct hapax bigram rows — different probabilities
    assert pruned[5].avg_surprisal_bits == pruned[6].avg_surprisal_bits
    assert pruned[5].avg_surprisal_bits != raw2[5].avg_surprisal_bits


def test_kneser_ney_surprisal_matches_hand_model(spark):
    from flinkecuserbehavioranalysis_spark.operators.text import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in kneser_ney_surprisal(docs, min_count=1).collect()}
    # model: c(a,b)=3 c(b,a)=1 c(b,c)=2; B=3; ctx a=(3,n1p 1) b=(3,n1p 2);
    # cont n1pl(a)=n1pl(b)=n1pl(c)=1; D=3/4 rationals over den=4·B·c_ctx=36:
    #   p(b|a)=30/36, p(a|b)=9/36, p(c|b)=21/36  (each checked by hand
    #   against max(c-D,0)/ctx + D·n1p/ctx · n1pl/B; Σ_cur p = 1)
    def s(num, den):
        return log2_q12_py(den) - log2_q12_py(num)

    d1 = 2 * s(30, 36) + s(9, 36) + s(21, 36)
    d2 = s(30, 36) + s(21, 36)
    assert out[1].n_bigrams == 4 and out[2].n_bigrams == 2
    assert out[1].avg_kn_bits == round(d1 / 4 / float(ONE_Q12), 6)
    assert out[2].avg_kn_bits == round(d2 / 2 / float(ONE_Q12), 6)
    # KN under-smooths vs add-one on frequent pairs: p_KN(b|a)=30/36 vs
    # add-one (3+1)/(3+3)=4/6 — lower surprisal for the frequent bigram
    assert s(30, 36) < s(4, 6)


def test_kneser_ney_wide_equals_narrow(spark):
    # the DECIMAL(38) chain must reproduce the int64 chain exactly on
    # the shared domain — the property that lets token_kn_perplexity_wide
    # reuse the narrow oracle
    from flinkecuserbehavioranalysis_spark.operators.text import kneser_ney_surprisal

    docs = spark.createDataFrame(
        [(1, "a b a b c d e a"), (2, "a b c c c"), (3, "x y x y x")],
        "doc_id long, text string",
    )
    narrow = sorted(map(tuple, kneser_ney_surprisal(docs, min_count=1).collect()))
    wide = sorted(map(tuple, kneser_ney_surprisal(docs, min_count=1, wide=True).collect()))
    assert narrow == wide


def test_kn_int64_guard_trips_loudly_at_the_bound(spark):
    # b*c_ctx past 2^61 must RAISE (silent wrap would corrupt every
    # surprisal downstream); at the bound it must pass
    from flinkecuserbehavioranalysis_spark.operators.text import (
        _KN_INT64_BOUND,
        _kn_guarded_den,
    )

    b = 1 << 31
    ok_ctx = _KN_INT64_BOUND // b          # largest safe c_ctx for this b
    df = spark.createDataFrame([(b, ok_ctx)], "b long, c_ctx long")
    got = df.select(_kn_guarded_den(F.col("b"), F.col("c_ctx")).alias("den")).collect()
    assert got[0].den == 4 * b * ok_ctx
    bad = spark.createDataFrame([(b, ok_ctx + 1)], "b long, c_ctx long")
    with pytest.raises(Exception, match="wide=True"):
        bad.select(_kn_guarded_den(F.col("b"), F.col("c_ctx")).alias("den")).collect()


# --- Gopher rules ------------------------------------------------------

_50_WORDS = "the quick brown fox jumps over lazy dogs near riverbank " * 5


def test_gopher_rules_battery(spark):
    good = _50_WORDS.strip()  # 50 words, stopword 'the' x5, varied
    short = "tiny doc of the and"  # fails word count, passes stopwords
    symbols = " ".join(["##" for _ in range(25)] * 2) + " the the"  # symbol flood
    repeat = "the " * 60  # top unigram = 100%
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, repeat)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].rule_word_count and out[1].rule_stopwords and out[1].rule_top_unigram
    assert out[1].verdict == "keep" and out[1].n_rules_failed == 0
    assert not out[2].rule_word_count and out[2].verdict == "drop"
    assert not out[3].rule_symbol_ratio and not out[3].rule_alpha_words
    assert not out[4].rule_top_unigram
    assert out[4].mean_word_len == 3.0  # boundary: inclusive, rule passes


def test_gopher_rules_null_and_empty_text_emit_no_row(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, _50_WORDS.strip())],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in gopher_rules(docs).collect()}
    assert got == {4}


# --- paragraph dedup ---------------------------------------------------


def test_paragraph_dedup_counts_corpus_repeats(spark):
    block = " ".join(f"w{i}" for i in range(25))
    uniq = " ".join(f"u{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, block + " " + uniq),        # para1 duplicated (doc 2 + self of 3), para2 unique
            (2, block),                      # single duplicated para
            (3, block + " " + block),        # self-repeat counts too
            (4, "short tail"),               # one sub-block para, unique
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup_stats(docs).collect()}
    assert out[1].n_paragraphs == 2 and out[1].n_dup_paragraphs == 1
    assert out[2].n_paragraphs == 1 and out[2].n_dup_paragraphs == 1
    assert out[3].n_paragraphs == 2 and out[3].n_dup_paragraphs == 2
    assert out[3].verdict == "drop" and out[1].verdict == "keep"
    assert out[4].n_paragraphs == 1 and out[4].n_dup_paragraphs == 0


# --- contamination report ----------------------------------------------


def test_contamination_report_eval_centric(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    train = spark.createDataFrame(
        [(10, shared + " extra tokens here"), (11, shared)],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(1, shared + " clean suffix words"), (2, "totally different eight gram words in here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in contamination_report(train, eval_docs, n=8).collect()}
    assert out[1].n_hit_grams == 1 and out[1].n_train_docs == 2
    assert out[2].n_hit_grams == 0 and out[2].n_train_docs == 0 and not out[2].contaminated
    assert out[1].n_grams == 4  # 11 words -> 4 distinct 8-grams


# --- reservoir sample --------------------------------------------------


def test_reservoir_sample_deterministic_and_displacement_only(spark):
    base = spark.range(0, 200).withColumnRenamed("id", "k")
    s1 = {r.k: r.rk for r in reservoir_sample(base, "k", 10).collect()}
    s2 = {r.k: r.rk for r in reservoir_sample(base.repartition(7), "k", 10).collect()}
    assert s1 == s2 and len(s1) == 10  # partition-independent
    grown = spark.range(0, 400).withColumnRenamed("id", "k")
    s3 = set(reservoir_sample(grown, "k", 10).select("k").toPandas()["k"])
    # reservoir invariant: growing the corpus only displaces, never reorders
    kept = set(s1) & s3
    pr = {r.k: r.priority for r in reservoir_sample(grown, "k", 400).collect()}
    assert all(pr[k] <= max(pr[j] for j in s3) for k in kept)
    assert len(s3) == 10


# --- URL canonicalization ----------------------------------------------


def test_canonical_url_collapses_variant_families(spark):
    urls = [
        (1, "http://Example.COM:80//docs//7/?utm_source=x&page=7#frag"),
        (2, "HTTPS://example.com/docs/7?page=7&utm_campaign=y"),
        (3, "http://example.com/docs/7/?page=7"),
        (4, "http://other.org/a"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    canon = {r.doc_id: r.c for r in df.select("doc_id", canonical_url("url").alias("c")).collect()}
    assert canon[1] == canon[2] == canon[3] == "example.com/docs/7?page=7"
    assert canon[4] == "other.org/a"
    groups = url_dedup_groups(df).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_variants == 3 and g.n_distinct_raw == 3 and g.keeper == 1


# --- session stats -----------------------------------------------------


def test_session_stats_bounce_and_landing(spark):
    rows = [
        # user 1: session A view->click (dur 100), session B lone error (bounce)
        (1, 1000.0, 1, "view"),
        (1, 1100.0, 2, "click"),
        (1, 10000.0, 3, "error"),
        # user 2: lone view (bounce)
        (2, 500.0, 4, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, tsd double, event_id long, event_type string")
    df = df.select("user_id", F.timestamp_seconds("tsd").alias("ts"), "event_id", "event_type")
    out = {r.landing: r for r in session_stats(df).collect()}
    assert out["view"].n_sessions == 2 and out["view"].n_bounces == 1
    assert out["view"].avg_events == 1.5
    assert out["view"].max_duration_sec == 100
    assert out["error"].n_sessions == 1 and out["error"].bounce_rate == 1.0


def test_session_stats_tied_boundary_landing_is_value_determined(spark):
    # two event types at the SAME (ts, event_id): landing must be the
    # coalesce('')-least type in every run/partitioning
    rows = [(1, 1000.0, 7, "view"), (1, 1000.0, 7, "click"), (1, 1000.0, 7, "view")]
    df = spark.createDataFrame(rows, "user_id long, tsd double, event_id long, event_type string")
    df = df.select("user_id", F.timestamp_seconds("tsd").alias("ts"), "event_id", "event_type")
    for run in range(3):
        out = session_stats(df.repartition(run + 2)).collect()
        assert len(out) == 1 and out[0].landing == "click" and out[0].avg_events == 3.0


def test_session_stats_null_vs_empty_type_tie_is_value_determined(spark):
    # round-10 advice: with coalesce('') alone, a NULL type and a real
    # empty string at the SAME (ts, event_id) tie in the ordering tuple
    # and the landing becomes arrival-order-dependent.  The (type IS
    # NULL) flag ahead of the coalesced value breaks the tie: the
    # non-null '' wins in every run/partitioning (and in the oracle).
    rows = [(1, 1000.0, 7, None), (1, 1000.0, 7, "")]
    df = spark.createDataFrame(rows, "user_id long, tsd double, event_id long, event_type string")
    df = df.select("user_id", F.timestamp_seconds("tsd").alias("ts"), "event_id", "event_type")
    for run in range(3):
        out = session_stats(df.repartition(run + 2)).collect()
        # one session of two events; the non-null '' row is the landing
        assert len(out) == 1
        assert out[0].landing == "" and out[0].n_sessions == 1
        assert out[0].avg_events == 2.0


def test_session_stats_null_key_sessions_survive(spark):
    # round-9 nulls2 tier lesson: NULL user_id is a REAL session group
    # (all NULL-key events sessionize together); the oracle's landing
    # join must be NULL-safe or these sessions silently vanish from the
    # report while the Spark side (landing computed in the same groupBy)
    # keeps them
    rows = [
        (None, 1000.0, 1, "view"),
        (None, 1100.0, 2, "click"),
        (None, 10000.0, 3, "error"),
        (7, 500.0, 4, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, tsd double, event_id long, event_type string")
    df = df.select("user_id", F.timestamp_seconds("tsd").alias("ts"), "event_id", "event_type")
    out = {r.landing: r for r in session_stats(df).collect()}
    assert out["view"].n_sessions == 2  # NULL-user view session + user 7
    assert out["error"].n_sessions == 1


# --- information-theoretic scoring (round-9 second wave) ----------------


def test_token_entropy_known_values(spark):
    import math

    from flinkecuserbehavioranalysis_spark.operators.text import token_entropy

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].entropy_bits == 0.0 and out[1].type_token_ratio == 0.25
    # uniform over 4 types: exactly 2 bits (log2q exact on powers of 2)
    assert out[2].entropy_bits == 2.0 and out[2].n_types == 4
    assert abs(out[3].entropy_bits - 1.0) < 1e-9
    assert out[3].n_tokens == 4 and out[3].n_types == 2
    # sanity vs float model for a skewed doc
    docs2 = spark.createDataFrame([(9, "x x x y z")], "doc_id long, text string")
    got = token_entropy(docs2).collect()[0].entropy_bits
    h = -(3 / 5 * math.log2(3 / 5) + 2 * (1 / 5) * math.log2(1 / 5))
    assert abs(got - h) < 1e-3  # Q12 truncation bound


def test_dsir_weights_favor_target_like_docs(spark):
    from flinkecuserbehavioranalysis_spark.operators.text import dsir_weights

    # target = docs containing 'good'; doc 3 shares the target vocabulary,
    # doc 4 is pure raw-only vocabulary
    docs = spark.createDataFrame(
        [
            (1, "good clean prose here"),
            (2, "good tidy words again"),
            (3, "clean prose again"),
            (4, "zz yy xx ww vv uu"),
        ],
        "doc_id long, text string",
    )
    pred = F.col("text").contains("good")
    out = {r.doc_id: r for r in dsir_weights(docs, pred, n_buckets=64).collect()}
    assert out[1].log2_weight_bits > out[4].log2_weight_bits
    assert out[3].log2_weight_bits > out[4].log2_weight_bits
    # keep flag is exactly (bits > 0); tiny-fixture smoothing mass can
    # push every weight negative, so assert consistency, not sign
    for r in out.values():
        assert r.resample_keep == (r.log2_weight_bits > 0)
    assert not out[4].resample_keep
    assert out[4].n_tokens == 6


def test_zipf_fit_exact_power_law(spark):
    from flinkecuserbehavioranalysis_spark.operators.text import zipf_fit

    # construct counts cnt(rank) = 2^(10-rank-ish): exact -1 slope in
    # log2 space when freq halves as rank doubles -> freq = 512/rank for
    # ranks 1,2,4,8,... ; use full 1..16 harmonic-ish set instead and
    # just assert the slope is near -1 and negative
    rows = []
    did = 0
    for rank in range(1, 17):
        tok = f"t{rank:02d}"
        for _ in range(max(1, 512 // rank)):
            rows.append((did, tok))
            did += 1
    docs = spark.createDataFrame(
        [(i, " ".join(t for _, t in rows[i::40])) for i in range(40)],
        "doc_id long, text string",
    )
    out = zipf_fit(docs, max_terms=16).collect()[0]
    assert out.n_terms == 16
    assert -1.2 < out.zipf_slope < -0.8


# --- cross-source overlap / stratified quota (round 10) ----------------


def test_source_overlap_matrix_hand_corpus(spark):
    from flinkecuserbehavioranalysis_spark.operators.dedup import source_overlap_matrix

    blk = " ".join(f"w{i}" for i in range(9))  # 9 words -> two 8-grams
    other = " ".join(f"x{i}" for i in range(8))  # disjoint single 8-gram
    docs = spark.createDataFrame(
        [
            (1, "A", blk),            # A: grams {g1, g2}
            (2, "B", blk + " tail"),  # B: grams {g1, g2, g3} (g3 ends in 'tail')
            (3, "C", other),          # C: disjoint {h1}
            (4, "A", "short doc"),    # < 8 words: no grams
            (5, None, blk),           # NULL source -> '' group, grams {g1, g2}
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.src_a, r.src_b): r for r in source_overlap_matrix(docs).collect()}
    ab = out[("A", "B")]
    assert (ab.n_shared, ab.n_a, ab.n_b) == (2, 2, 3)
    assert ab.containment_a == 1.0 and ab.containment_b == round(2 / 3, 6)
    assert ab.jaccard == round(2 / 3, 6)
    # NULL-source group pairs with both A and B on the shared block
    assert out[("", "A")].n_shared == 2 and out[("", "B")].n_shared == 2
    # disjoint sources emit NO row (inner pair join)
    assert ("A", "C") not in out and ("B", "C") not in out


def test_source_overlap_matrix_max_sources_per_gram_cap(spark):
    # round-10 verdict #6: the optional df cap bounds the C(k,2) pair
    # fan-out per gram; capped grams leave BOTH the shared counts and
    # the per-source totals, keeping containment/Jaccard coherent over
    # the retained universe.  Default None stays exact.
    from flinkecuserbehavioranalysis_spark.operators.dedup import source_overlap_matrix

    boiler = " ".join(f"w{i}" for i in range(8))   # one 8-gram, in A B C D
    rare = " ".join(f"r{i}" for i in range(8))     # one 8-gram, in A B only
    docs = spark.createDataFrame(
        [
            (1, "A", boiler), (2, "B", boiler), (3, "C", boiler), (4, "D", boiler),
            (5, "A", rare), (6, "B", rare),
        ],
        "doc_id long, source string, text string",
    )
    exact = {(r.src_a, r.src_b): r for r in source_overlap_matrix(docs).collect()}
    assert len(exact) == 6  # all C(4,2) pairs share the boilerplate gram
    assert exact[("A", "B")].n_shared == 2 and exact[("C", "D")].n_shared == 1
    capped = {
        (r.src_a, r.src_b): r
        for r in source_overlap_matrix(docs, max_sources_per_gram=2).collect()
    }
    # the 4-source boilerplate gram is dropped everywhere: only the
    # rare-gram pair survives, with totals restricted to the retained
    # universe (A and B each retain exactly the rare gram)
    assert set(capped) == {("A", "B")}
    ab = capped[("A", "B")]
    assert (ab.n_shared, ab.n_a, ab.n_b, ab.jaccard) == (1, 1, 1, 1.0)


def test_source_unigram_js_matches_hand_model(spark):
    # JS from the corpus mix, computed independently with the Q12 model:
    # identical sums, identical double-combination order
    from flinkecuserbehavioranalysis_spark.operators.text import source_unigram_js

    corpora = {"A": "a a b c".split(), "B": "a d d".split()}
    docs = spark.createDataFrame(
        [(i, s, " ".join(toks)) for i, (s, toks) in enumerate(corpora.items())],
        "doc_id long, source string, text string",
    )
    from collections import Counter

    cw = Counter()
    sw = {}
    for s, toks in corpora.items():
        sw[s] = Counter(toks)
        cw.update(toks)
    n_tot = sum(cw.values())
    lg = log2_q12_py

    def py_js(c):
        n_s = sum(c.values())
        a_p = sum(k * (lg(k) - lg(k * n_tot + cw[w] * n_s)) for w, k in c.items())
        a_q = sum(
            cw[w] * (lg(cw[w]) - lg(k * n_tot + cw[w] * n_s)) for w, k in c.items()
        )
        m_s = sum(cw[w] for w in c)
        kl_p = (a_p + n_s * lg(2 * n_tot)) / n_s
        kl_q = (a_q + m_s * lg(2 * n_s)) / n_tot
        return round(((kl_p + kl_q) / float(ONE_Q12) + (n_tot - m_s) / n_tot) * 0.5, 6)

    out = {r.source: r for r in source_unigram_js(docs).collect()}
    for s, c in sw.items():
        assert out[s].js_bits == py_js(c), s
        assert 0.0 <= out[s].js_bits <= 1.001
    # identical corpora diverge less than disjoint ones
    same = {"A": "x y z".split(), "B": "x y z".split()}
    d2 = spark.createDataFrame(
        [(i, s, " ".join(t)) for i, (s, t) in enumerate(same.items())],
        "doc_id long, source string, text string",
    )
    js_same = {r.source: r.js_bits for r in source_unigram_js(d2).collect()}
    assert all(v <= 0.001 for v in js_same.values())
    assert out["B"].js_bits > 0.05


def _py_winnow_keys(text, k=4, w=4):
    # reference model mirroring operators/dedup._winnow_selected
    import hashlib

    ws = [t for t in text.split(" ") if t != ""]
    m = len(ws) - k + 1
    if m < 1:
        return 0, set()
    keys = []
    for i in range(1, m + 1):
        g = " ".join(ws[i - 1 : i - 1 + k])
        h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
        keys.append(h * (1 << 20) + ((1 << 20) - 1 - i))
    sel = {min(keys[j - 1 : j - 1 + w]) for j in range(1, max(1, m - w + 1) + 1)}
    return m, sel


def test_winnow_fingerprints_matches_python_model(spark):
    from flinkecuserbehavioranalysis_spark.operators.dedup import winnow_fingerprints

    texts = [
        "a b c d e f g h i j",
        "one two three four",            # exactly k words -> one gram
        "x x x x x x x x",               # all-identical grams
        "p q r s t u",                   # m=3 < w: single clipped window
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in winnow_fingerprints(docs).collect()}
    for i, t in enumerate(texts):
        m, sel = _py_winnow_keys(t)
        assert (got[i].n_grams, got[i].n_fingerprints) == (m, len(sel)), t


def test_winnow_guarantee_shared_run_always_matches(spark):
    # Schleimer Thm 1: any shared run of >= w+k-1 = 7 words surfaces at
    # least one shared fingerprint, REGARDLESS of offset — the property
    # a uniform gram sample does not have
    from flinkecuserbehavioranalysis_spark.operators.dedup import winnow_source_matches

    run = "alpha beta gamma delta epsilon zeta eta"  # 7 shared words
    docs = spark.createDataFrame(
        [
            (1, "A", "lead1 lead2 " + run + " tailA1 tailA2"),
            (2, "B", "x1 x2 x3 x4 x5 " + run),      # different offset
            (3, "C", "c1 c2 c3 c4 c5 c6 c7 c8"),    # disjoint
        ],
        "doc_id long, source string, text string",
    )
    out = {(r.src_a, r.src_b): r for r in winnow_source_matches(docs).collect()}
    assert ("A", "B") in out and out[("A", "B")].n_shared >= 1
    assert all("C" not in pair for pair in out)


def test_stratified_quota_largest_remainder_exact_total(spark):
    from flinkecuserbehavioranalysis_spark.operators.sampling import stratified_quota

    # strata sizes chosen so remainders force the correction: N = 97,
    # T = 9; bases 2+3+0+2 = 7, deficit 2 -> the two largest remainders
    # (9 for 'a', 8 for 'd'; 'c' rem 7, 'b' rem 3) get +1
    rows = [("a", 29), ("b", 33), ("c", 7), ("d", 28)]
    data = [(s, i) for s, n in rows for i in range(n)]
    df = spark.createDataFrame(data, "source string, doc_id long")
    out = {r.stratum: r for r in stratified_quota(df).collect()}
    assert {s: r.quota for s, r in out.items()} == {"a": 3, "b": 3, "c": 0, "d": 3}
    assert sum(r.quota for r in out.values()) == 97 // 10
    # proportionality: every quota within 1 of the exact share
    for s, n in rows:
        assert abs(out[s].quota - n / 10) < 1


import pytest  # noqa: E402
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@pytest.mark.soak
@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=9))
@settings(max_examples=8, deadline=None)
def test_stratified_quota_invariants_property(spark, sizes):
    """Hamilton-apportionment invariants on randomized strata (pure-
    Python model vs the Spark operator): Σ quota == floor(N/10) exactly,
    every quota within 1 of its exact share (no-paradox bound for fixed
    fraction), and quotas match the reference apportionment."""
    from flinkecuserbehavioranalysis_spark.operators.sampling import stratified_quota

    strata = [f"s{i:02d}" for i in range(len(sizes))]
    data = [(s, j) for s, n in zip(strata, sizes) for j in range(n)]
    df = spark.createDataFrame(data, "source string, doc_id long")
    got = {r.stratum: r.quota for r in stratified_quota(df).collect()}
    n_total = sum(sizes)
    t = n_total // 10
    base = {s: n // 10 for s, n in zip(strata, sizes)}
    rem = {s: n % 10 for s, n in zip(strata, sizes)}
    order = sorted(strata, key=lambda s: (-rem[s], s))
    expect = dict(base)
    for s in order[: t - sum(base.values())]:
        expect[s] += 1
    assert got == expect
    assert sum(got.values()) == t
    for s, n in zip(strata, sizes):
        assert abs(got[s] - n / 10) < 1


def test_source_unigram_kl_matches_direct_sum(spark):
    """The operator's closed-form absent-word regrouping must equal the
    DIRECT full-vocab Q12 sum (pure-Python reference), and order sources
    by genuine divergence."""
    from flinkecuserbehavioranalysis_spark.operators.text import source_unigram_kl

    docs = spark.createDataFrame(
        [
            (1, "A", "x x y"),
            (2, "B", "x z"),
            (3, None, "x y"),   # NULL source -> '' group
            (4, "A", None),     # NULL text excluded
        ],
        "doc_id long, source string, text string",
    )
    got = {r.source: r for r in source_unigram_kl(docs).collect()}

    corpus = {"x": 4, "y": 2, "z": 1}
    n_total, v = 7, 3
    per_src = {"A": {"x": 2, "y": 1}, "B": {"x": 1, "z": 1}, "": {"x": 1, "y": 1}}

    def direct_kl(cs):
        n_s = sum(cs.values())
        acc = 0
        for w, c_w in corpus.items():
            c_sw = cs.get(w, 0)
            acc += (c_sw + 1) * (
                log2_q12_py(c_sw + 1)
                + log2_q12_py(n_total + v)
                - log2_q12_py(n_s + v)
                - log2_q12_py(c_w + 1)
            )
        return round(acc / (n_s + v) / float(ONE_Q12), 6)

    for s, cs in per_src.items():
        assert got[s].kl_bits == direct_kl(cs), s
        assert got[s].n_tokens == sum(cs.values())
        assert got[s].n_types == len(cs)
    # B is the diverger (z is B-only, y unseen): strictly larger KL
    assert got["B"].kl_bits > got["A"].kl_bits


def test_source_vocab_mi_matches_direct_decomposition(spark):
    """MI via A−B−C+D must equal the direct Σ p(s,w)·lg(p(s,w)/(p(s)p(w)))
    Q12 reference, and the degenerate single-source corpus must report
    MI = 0 with a NULL uncertainty coefficient."""
    from flinkecuserbehavioranalysis_spark.operators.text import source_vocab_mi

    docs = spark.createDataFrame(
        [(1, "A", "x x y"), (2, "B", "x z"), (3, None, "x y")],
        "doc_id long, source string, text string",
    )
    row = source_vocab_mi(docs).collect()[0]
    per = {"A": {"x": 2, "y": 1}, "B": {"x": 1, "z": 1}, "": {"x": 1, "y": 1}}
    n_s = {s: sum(c.values()) for s, c in per.items()}
    c_w = {}
    for c in per.values():
        for w, k in c.items():
            c_w[w] = c_w.get(w, 0) + k
    n = sum(n_s.values())
    acc = 0
    for s, cs in per.items():
        for w, k in cs.items():
            acc += k * (
                log2_q12_py(k) + log2_q12_py(n) - log2_q12_py(n_s[s]) - log2_q12_py(c_w[w])
            )
    h_s_num = n * log2_q12_py(n) - sum(k * log2_q12_py(k) for k in n_s.values())
    assert row.mi_bits == round(acc / n / float(ONE_Q12), 6)
    assert row.h_source_bits == round(h_s_num / n / float(ONE_Q12), 6)
    assert row.uncertainty_coef == round(acc / h_s_num, 6)
    assert (row.n_sources, row.n_types, row.n_tokens) == (3, 3, 7)
    one = source_vocab_mi(
        spark.createDataFrame([(1, "A", "x y x")], "doc_id long, source string, text string")
    ).collect()[0]
    assert one.mi_bits == 0.0 and one.uncertainty_coef is None


def test_heaps_law_fit_recovers_planted_exponent(spark):
    """Strata planted on an exact power law V = N^0.5 (perfect squares)
    must fit beta ≈ 0.5; a single-stratum corpus reports NULLs."""
    from flinkecuserbehavioranalysis_spark.operators.text import heaps_law_fit

    rows = []
    did = 0
    # source s_k has n = 4^k tokens over v = 2^k distinct types —
    # EXACT on the Q12 log grid (powers of two), so OLS recovers 0.5
    for k in (2, 3, 4, 5):
        n, v = 4 ** k, 2 ** k
        toks = [f"w{i % v}" for i in range(n)]
        did += 1
        rows.append((did, f"s{k}", " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    row = heaps_law_fit(docs).collect()[0]
    assert row.n_points == 4
    assert row.heaps_beta == 0.5  # exact: x = 2k·4096, y = k·4096
    one = heaps_law_fit(
        spark.createDataFrame([(1, "A", "x y")], "doc_id long, source string, text string")
    ).collect()[0]
    assert one.heaps_beta is None and one.intercept_bits is None

"""Record-linkage operators (operators/linkage.py): SymSpell
deletion-neighborhood blocking completeness vs the brute-force
quadratic, best-match semantics, and the ASCII domain filter."""

from __future__ import annotations

import itertools

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from flinkecuserbehavioranalysis_spark.operators.linkage import (
    ascii_only,
    deletion_variants_expr,
    fuzzy_best_match,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


#: short strings over a tiny alphabet — maximizes near-collisions so the
#: completeness property is actually exercised, not vacuously true
_names = st.lists(
    st.text(alphabet="abcx", min_size=0, max_size=6), min_size=1, max_size=25
)


@given(_names, st.integers(min_value=1, max_value=2))
@settings(max_examples=10, deadline=None)
def test_fuzzy_self_pairs_matches_brute_force(spark, names, k):
    uniq = sorted(set(names))
    df = spark.createDataFrame([(n,) for n in uniq], "s string")
    got = {(r.s_a, r.s_b, r.dist) for r in fuzzy_self_pairs(df, "s", k).collect()}
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= k
    }
    assert got == want


@given(st.text(alphabet="abz", min_size=0, max_size=5))
@settings(max_examples=15, deadline=None)
def test_deletion_variants_are_exactly_the_deletion_neighborhood(spark, s):
    def dels(x):
        return {x[:i] + x[i + 1 :] for i in range(len(x))}

    want = {s} | dels(s) | {y for d in dels(s) for y in dels(d)}
    row = (
        spark.createDataFrame([(s,)], "s string")
        .select(F.expr(deletion_variants_expr("s", 2)).alias("v"))
        .collect()[0]
    )
    assert set(row.v) == want
    assert len(row.v) == len(set(row.v))  # array_distinct held


def test_fuzzy_best_match_argmin_and_ties(spark):
    probes = spark.createDataFrame([("abx",), ("zzzz",), ("ab",)], "p string")
    cat = spark.createDataFrame([("abc",), ("abd",), ("ab",)], "c string")
    got = {
        (r.p, r.best_match, r.dist)
        for r in fuzzy_best_match(probes, cat, "p", "c", 1).collect()
    }
    # abx: dist-1 ties abc/abd/ab -> lexicographically least 'ab';
    # exact probe wins at dist 0; out-of-range probe omitted
    assert got == {("abx", "ab", 1), ("ab", "ab", 0)}


def test_ascii_contract_excludes_multibyte_and_null(spark):
    df = spark.createDataFrame(
        [("plain",), ("héllo",), (None,), ("",)], "s string"
    )
    kept = {r.s for r in df.where(ascii_only("s")).collect()}
    assert kept == {"plain", ""}
    # and the pair operator never emits a non-ASCII side
    pairs = fuzzy_self_pairs(df, "s", 2).collect()
    assert all("é" not in r.s_a and "é" not in r.s_b for r in pairs)

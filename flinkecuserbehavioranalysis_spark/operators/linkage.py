"""Record linkage / fuzzy string matching (extension — training-data
pipeline).

Not in the reference (its joins are exact-keyed, SURVEY.md §2.7); these
are the entity-resolution operators a corpus pipeline needs to link
noisy catalogs, collapse typo'd identifiers, and normalize vocabulary —
all without the O(n²) cross join that kills edit-distance matching at
scale.

**Blocking = SymSpell deletion neighborhoods.** For edit distance
``lev(a, b) <= k``, take any optimal edit script: the unchanged
characters form a common subsequence reachable from EITHER string by
deleting at most *k* characters — so the up-to-*k*-deletion
neighborhoods of *a* and *b* intersect.  Exploding each distinct string
into its neighborhood and self-joining on the variant is therefore a
PROVABLY COMPLETE candidate generator (property-tested against the
brute-force quadratic in tests/test_linkage.py), with per-string cost
O(n^k) variants — the name/token regime (n ≲ 100, k ≤ 2), NOT the
document regime (use MinHash, operators/dedup.py, for those).

Scale shape: one map-side explode, one equi-join on an 8-byte
``xxhash64(variant)`` key (hash collisions only add candidates, which
verification removes), one ``levenshtein`` verify on candidates only.
No cross join anywhere; the hot bucket is the empty-string variant,
shared only by strings of length <= k.

**ASCII contract.** Spark's ``levenshtein`` counts codepoint edits;
DuckDB's counts BYTE edits — they diverge on any non-ASCII string
(lev('héllo','hello') is 1 vs 2).  Every linkage surface therefore
filters to ASCII strings (bytes == chars, where the two agree) on BOTH
engines — Spark ``octet_length(s) = length(s)``, DuckDB ``strlen(s) =
length(s)`` (DuckDB 1.0's octet_length is BLOB-only); non-ASCII
identifiers are out of contract, matching the typo-matching use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ascii_only(c) -> F.Column:
    """Predicate: *c* is non-NULL pure ASCII (bytes == chars) — the
    domain on which Spark and DuckDB edit distances agree (module
    docstring).  Oracle twin: ``strlen(s) = length(s)``."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNotNull() & (F.octet_length(col) == F.length(col))


def _del1(s: str, i: str) -> str:
    """SQL: *s* with 1-based char position *i* deleted."""
    return f"concat(substring({s}, 1, {i} - 1), substring({s}, {i} + 1))"


def _del2(s: str, i: str, j: str) -> str:
    """SQL: *s* with 1-based positions *i* < *j* deleted."""
    return (
        f"concat(substring({s}, 1, {i} - 1), "
        f"substring({s}, {i} + 1, {j} - {i} - 1), substring({s}, {j} + 1))"
    )


def deletion_variants_expr(str_col: str, k: int) -> str:
    """SQL array expression: every string reachable from *str_col* by
    deleting up to *k* (1 or 2) characters, deduplicated.  CASE guards
    keep ``sequence()`` ascending (Spark's sequence COUNTS DOWN when
    start > stop — an empty string must yield array(s), not a reversed
    range)."""
    if k not in (1, 2):
        raise ValueError("deletion_variants_expr: k must be 1 or 2")
    s = str_col
    d1 = (
        f"CASE WHEN length({s}) >= 1 THEN "
        f"transform(sequence(1, length({s})), i -> {_del1(s, 'i')}) "
        f"ELSE array() END"
    )
    parts = [f"array({s})", d1]
    if k == 2:
        d2 = (
            f"CASE WHEN length({s}) >= 2 THEN "
            f"flatten(transform(sequence(1, length({s}) - 1), "
            f"i -> transform(sequence(i + 1, length({s})), j -> {_del2(s, 'i', 'j')}))) "
            f"ELSE array() END"
        )
        parts.append(d2)
    return f"array_distinct(concat({', '.join(parts)}))"


def deletion_neighborhood(df: DataFrame, str_col: str, k: int) -> DataFrame:
    """(*str_col*, ``__vh``) pairs — each string exploded to the
    xxhash64 of every member of its up-to-*k*-deletion neighborhood.
    Map-side only; the hash keeps the join key 8 bytes regardless of
    string length."""
    return df.select(
        F.col(str_col),
        F.explode(F.expr(deletion_variants_expr(str_col, k))).alias("__v"),
    ).select(str_col, F.xxhash64("__v").alias("__vh"))


def fuzzy_self_pairs(
    strings: DataFrame, str_col: str, max_dist: int, dist_col: str = "dist"
) -> DataFrame:
    """All unordered pairs of DISTINCT ASCII strings with
    ``levenshtein <= max_dist`` — (``{str_col}_a``, ``{str_col}_b``,
    *dist_col*), a < b.  Complete by the deletion-neighborhood theorem
    (module docstring); the length pre-filter is a pure prune
    (|len(a) - len(b)| > k implies lev > k)."""
    base = strings.select(str_col).where(ascii_only(str_col)).distinct()
    nb = deletion_neighborhood(base, str_col, max_dist)
    a_col, b_col = f"{str_col}_a", f"{str_col}_b"
    left = nb.select(F.col(str_col).alias(a_col), "__vh")
    right = nb.select(F.col(str_col).alias(b_col), "__vh")
    cand = (
        left.join(right, "__vh")
        .where(F.col(a_col) < F.col(b_col))
        .select(a_col, b_col)
        .distinct()
    )
    return cand.where(
        F.abs(F.length(a_col) - F.length(b_col)) <= max_dist
    ).select(
        a_col,
        b_col,
        F.levenshtein(a_col, b_col).alias(dist_col),
    ).where(F.col(dist_col) <= max_dist)


def fuzzy_best_match(
    probes: DataFrame,
    catalog: DataFrame,
    probe_col: str,
    cat_col: str,
    max_dist: int,
) -> DataFrame:
    """Each distinct ASCII probe linked to its best catalog entry within
    *max_dist* edits: (*probe_col*, ``best_match``, ``dist``) — ties
    broken by the lexicographically least catalog string, probes with
    no match within range omitted.  Same blocked candidate generation
    as :func:`fuzzy_self_pairs`, then an arg-min per probe (min over a
    (dist, string) struct — one aggregation, no window)."""
    p = probes.select(probe_col).where(ascii_only(probe_col)).distinct()
    c = catalog.select(cat_col).where(ascii_only(cat_col)).distinct()
    pn = deletion_neighborhood(p, probe_col, max_dist)
    cn = deletion_neighborhood(c, cat_col, max_dist).withColumnRenamed(
        cat_col, "__cat"
    )
    cand = pn.join(cn, "__vh").select(probe_col, "__cat").distinct()
    scored = cand.where(
        F.abs(F.length(probe_col) - F.length("__cat")) <= max_dist
    ).select(
        probe_col,
        F.col("__cat"),
        F.levenshtein(probe_col, "__cat").alias("__d"),
    ).where(F.col("__d") <= max_dist)
    best = scored.groupBy(probe_col).agg(
        F.min(F.struct(F.col("__d"), F.col("__cat"))).alias("__best")
    )
    return best.select(
        probe_col,
        F.col("__best.__cat").alias("best_match"),
        F.col("__best.__d").alias("dist"),
    )

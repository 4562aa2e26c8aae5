"""Frequent-itemset mining (market-basket) — the A-priori pair level
as DataFrame algebra.

Beyond the reference's surface (its ad/behavior jobs stop at per-key
counts); included because co-occurrence mining is a standard batch
analytics ask on the same event/order data, and its distributed shape
is instructive: the candidate explosion is bounded per basket, never
corpus-quadratic."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_stats(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """The shared A-priori pair-level statistics relation
    (item_a, item_b, support, __fa, __fb, __n) with item_a < item_b and
    support >= *min_support* — the common core of :func:`frequent_pairs`
    and :func:`association_rules`, which otherwise each re-ran the
    basket self-join + three aggregations.  PINNED in the session frame
    cache keyed on (input plan hash, columns, min_support) via a lazy
    localCheckpoint: the relation is the frequent-pair set (the
    artifact A-priori materializes by design — min_support-filtered,
    far below the basket-item stream), and the checkpoint also
    truncates the self-join lineage out of consumer plans (r11)."""

    def build() -> DataFrame:
        # null items/baskets would silently vanish in the self-join
        # (null never equals null) — drop them explicitly so the
        # contract is visible
        bi = (
            baskets.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
            .filter(F.col("__b").isNotNull() & F.col("__i").isNotNull())
            .distinct()
        )
        n_baskets = bi.select(F.countDistinct("__b").alias("__n"))
        freq = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__f"))
        a, b = bi.alias("a"), bi.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__i") < F.col("b.__i")),
            )
            .groupBy(F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b"))
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
        )
        return (
            pairs.join(
                freq.select(F.col("__i").alias("item_a"), F.col("__f").alias("__fa")),
                "item_a",
            )
            .join(
                freq.select(F.col("__i").alias("item_b"), F.col("__f").alias("__fb")),
                "item_b",
            )
            .crossJoin(F.broadcast(n_baskets))
            .localCheckpoint(eager=False)
        )

    from .. import cache as _frame_cache

    app = baskets.sparkSession.sparkContext.applicationId
    return _frame_cache.pin(
        (app, "apriori_pair_stats", baskets.semanticHash(), basket_col, item_col, min_support),
        build,
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    topk: int | None = 100,
) -> DataFrame:
    """Item pairs co-occurring in at least *min_support* baskets, with
    lift — support(a,b) · N / (freq(a) · freq(b)) — against
    independence.

    Returns (item_a, item_b, support, lift) with item_a < item_b,
    ordered by (support desc, lift desc, item_a, item_b) and cut to
    *topk* when given (fully tiebroken → deterministic in any engine).

    Scale shape: the pair generation self-joins the distinct
    (basket, item) relation on the basket key, so it is quadratic only
    WITHIN a basket (baskets are small by construction — order lines,
    session items); the candidate stream then hits one pair-keyed
    count with map-side partial aggregation.  Item frequencies are one
    item-keyed count joined back on each side of the pair; the basket
    total rides a broadcast scalar.  Skewed mega-baskets (a crawler
    "session" with 10⁵ items) should be capped upstream — cost is
    Σ|basket|², the A-priori literature's standard caveat."""
    stats = _pair_stats(baskets, basket_col, item_col, min_support)
    out = (
        stats.select(
            "item_a",
            "item_b",
            "support",
            F.round(
                F.col("support") * F.col("__n") / (F.col("__fa") * F.col("__fb")), 6
            ).alias("lift"),
        )
    )
    ordered = out.orderBy(
        F.desc("support"), F.desc("lift"), F.asc("item_a"), F.asc("item_b")
    )
    return ordered.limit(topk) if topk else ordered


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    min_confidence: float = 0.0,
    topk: int | None = 100,
) -> DataFrame:
    """Directional pair rules from the same A-priori pair level:
    each frequent pair (a, b) yields a→b with confidence
    support(a,b)/freq(a) and b→a with support(a,b)/freq(b); lift is
    direction-free.  Returns (antecedent, consequent, support,
    confidence, lift) ordered by (confidence desc, support desc,
    antecedent, consequent), optionally cut to *topk* — fully
    tiebroken, deterministic in any engine.  Same scale shape as
    :func:`frequent_pairs` (the directional expansion is a map over
    the pair-level relation, two rows per pair)."""
    stats = _pair_stats(baskets, basket_col, item_col, min_support)
    lift = F.round(F.col("support") * F.col("__n") / (F.col("__fa") * F.col("__fb")), 6)
    fwd = stats.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support",
        F.round(F.col("support") / F.col("__fa"), 6).alias("confidence"),
        lift.alias("lift"),
    )
    rev = stats.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "support",
        F.round(F.col("support") / F.col("__fb"), 6).alias("confidence"),
        lift.alias("lift"),
    )
    out = fwd.unionAll(rev).filter(F.col("confidence") >= min_confidence)
    ordered = out.orderBy(
        F.desc("confidence"), F.desc("support"), F.asc("antecedent"), F.asc("consequent")
    )
    return ordered.limit(topk) if topk else ordered


def cooccurrence_similarity(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    min_support: int = 3,
    activity_cap: int = 200,
) -> DataFrame:
    """Item-to-item co-occurrence cosine — the classic "users who
    touched X also touched Y" item-based CF statistic (Linden et al.
    IEEE IC'03, public literature): for items a < b,

        cos(a, b) = |U_a ∩ U_b| / sqrt(|U_a| * |U_b|)

    over distinct (user, item) interactions.

    Scale shape: the pair explosion is the user-keyed self-join, so the
    cost is Σ_u |items_u|² — a hyperactive user (crawler, bot, power
    account) is the one thing that can blow it up.  *activity_cap*
    bounds every user's contribution to its *cap* deterministically
    chosen items (md5 rank with item tiebreak — engine-stable, not
    top-recency, so the sample is unbiased across items); |U_i| counts
    are taken AFTER capping so the cosine stays internally consistent.
    At test SF the cap never binds; at 100 TB it is the difference
    between Σ min(|items_u|, cap)² and an unbounded quadratic.

    sqrt of the exact int64 product is IEEE-correctly-rounded, and the
    final division is single — both engine-identical; no rounding
    applied (integer-ratio dyadics, see ``ngram_jaccard_pairs``).

    Returns (item_a, item_b, n_both, n_a, n_b, cos_sim) for pairs with
    ``n_both >= min_support``."""
    from pyspark.sql import Window

    ui = (
        interactions.select(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .filter(F.col("u").isNotNull() & F.col("i").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("u").orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
    ui = (
        ui.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= activity_cap)
        .drop("__rn")
    )
    freq = ui.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    a, b = ui.alias("a"), ui.alias("b")
    both = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_support)
    )
    fa = freq.select(F.col("i").alias("item_a"), F.col("n").alias("n_a"))
    fb = freq.select(F.col("i").alias("item_b"), F.col("n").alias("n_b"))
    return (
        both.join(fa, "item_a")
        .join(fb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cos_sim"),
        )
    )

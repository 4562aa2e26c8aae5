"""Two-stream reconciliation joins (SURVEY.md §2.7 J1-J2).

Reference semantics reproduced:

- **interval join** (OrderPayTxMatchWithJoin.scala:54-57):
  ``orders.keyBy(txId).intervalJoin(receipts.keyBy(txId))
  .between(-5s, +3s)`` — matches where
  ``receipt.ts ∈ [order.ts - lower, order.ts + upper]``.  Here an
  equi-join on the key plus a range predicate; Catalyst's
  ``EnsureRequirements`` co-partitions both sides on the key exactly
  like the two ``keyBy`` calls, and AQE picks broadcast when one side
  is small.
- **CoProcessFunction full-outer match with timeout**
  (OrderPayTxMatch.scala:71-126): one pending event per side in
  ``ValueState``, unmatched side emitted on timer → here a
  ``full_outer`` join; the null-padded side *is* the reference's
  ``unmatched-pays`` / ``unmatched-receipts`` side outputs, surfaced as
  a ``status`` column instead of OutputTags.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MATCHED = "matched"
UNMATCHED_LEFT = "unmatched-pays"  # OrderPayTxMatch.scala:59
UNMATCHED_RIGHT = "unmatched-receipts"  # OrderPayTxMatch.scala:60


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 5,
    upper_seconds: float = 3,
    how: str = "inner",
) -> DataFrame:
    """J1 — equi+range join: ``right.ts ∈ [left.ts - lower, left.ts + upper]``.

    At scale this is a co-partitioned sort-merge join on *key*; the range
    predicate evaluates post-merge per key group (cheap — per-key row
    counts are small for transaction ids).
    """
    l_, r_ = left.alias("l"), right.alias("r")
    lts = F.col(f"l.{left_ts}").cast("double")
    rts = F.col(f"r.{right_ts}").cast("double")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts - F.lit(float(lower_seconds)))
        & (rts <= lts + F.lit(float(upper_seconds)))
    )
    return l_.join(r_, cond, how)


def tx_match_full_outer(
    pays: DataFrame,
    receipts: DataFrame,
    key: str = "tx_id",
    pay_ts: str = "ts",
    receipt_ts: str = "ts",
) -> DataFrame:
    """J2 — match every pay with its receipt on *key*; classify rows as
    matched / unmatched-pays / unmatched-receipts (the reference's main
    output + two side outputs, OrderPayTxMatch.scala:63-65)."""
    p = pays.select(F.col(key).alias("p_key"), F.col(pay_ts).alias("p_ts"))
    r = receipts.select(F.col(key).alias("r_key"), F.col(receipt_ts).alias("r_ts"))
    joined = p.join(r, p.p_key == r.r_key, "full_outer")
    status = (
        F.when(F.col("p_key").isNotNull() & F.col("r_key").isNotNull(), F.lit(MATCHED))
        .when(F.col("r_key").isNull(), F.lit(UNMATCHED_LEFT))
        .otherwise(F.lit(UNMATCHED_RIGHT))
    )
    return joined.select(
        F.coalesce(F.col("p_key"), F.col("r_key")).alias(key),
        F.col("p_ts").cast("long").alias("pay_ts"),
        F.col("r_ts").cast("long").alias("receipt_ts"),
        status.alias("status"),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach to every left row the right row with the
    greatest ``right_ts <= left_ts`` (*direction*='backward', default —
    the standard quote/trade alignment) or the smallest
    ``right_ts >= left_ts`` (*direction*='forward' — "next following",
    e.g. the next order after a touchpoint) for the same *key*
    (extension — no reference analog; generalizes J1's time matching).

    Distributed shape: instead of the naive inequality join (which
    explodes to all prior rows before a per-left-row argmax), both sides
    are union-tagged and sorted once per key; ``last(ignorenulls)`` over
    a running window propagates the latest right payload onto each left
    row.  ONE shuffle on *key*, no row explosion — the only formulation
    that survives 100 TB sides.

    Requirements: *right_payload* names must not collide with left
    columns, and the right side must be unique per (key, right_ts)
    (pre-aggregate otherwise) so ties are deterministic.  Left rows with
    no prior right row keep NULL payloads (left-outer semantics).

    NULL timestamps: a right row with NULL *right_ts* can never satisfy
    the inequality (three-valued logic) and is excluded; a left row with
    NULL *left_ts* has no "as of" point and keeps NULL payloads — the
    payload fill is explicitly masked on a NULL left timestamp (in the
    forward direction a descending sort would otherwise place NULL left
    rows after every right row and spuriously match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("as_of_join: direction must be 'backward' or 'forward'")
    right = right.where(F.col(right_ts).isNotNull())
    lcols = left.columns
    l2 = left.withColumn("__t", F.col(left_ts)).withColumn("__tag", F.lit(1))
    for c in right_payload:
        l2 = l2.withColumn(c, F.lit(None))
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in right_payload],
    )
    for c in lcols:
        if c != key:
            r2 = r2.withColumn(c, F.lit(None))
    unioned = l2.select(key, "__t", "__tag", *[c for c in lcols if c != key], *right_payload).unionByName(
        r2.select(key, "__t", "__tag", *[c for c in lcols if c != key], *right_payload)
    )
    # right rows (__tag=0) sort before left rows at the same timestamp →
    # a right row AT left_ts is visible to that left row (<= / >=
    # semantics); forward direction walks time DESCENDING so the running
    # last-value is the nearest FOLLOWING right row
    order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(order, F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        key,
        "__t",
        "__tag",
        *[c for c in lcols if c != key],
        *[
            F.when(
                F.col("__t").isNotNull(),
                F.last(c, ignorenulls=True).over(w),
            ).alias(c)
            for c in right_payload
        ],
    )
    return filled.filter(F.col("__tag") == 1).select(*lcols, *right_payload)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float = 5,
    upper_seconds: float = 5,
) -> DataFrame:
    """Keyless time-range join — ``right.ts ∈ [left.ts - lower,
    left.ts + upper]`` with NO equi key — restated as an equi-join on
    time bins so Catalyst gets a hash-partitionable key.

    A raw non-equi join between two large relations becomes
    ``BroadcastNestedLoopJoin`` (quadratic, and the broadcast side must
    fit in memory) — the classic range-join trap.  Binning: with bin
    width ``W = lower + upper``, each left row's window overlaps at
    most 2 consecutive bins (explode ≤ 2 rows), each right row lives in
    exactly 1 bin (``floor(ts / W)``) — so every qualifying pair meets
    in exactly one bin and no deduplication is needed.  The join is
    then a plain shuffled equi-join on ``__bin`` with the exact range
    predicate evaluated post-match.  Same technique as Databricks'
    range-join bin optimization; at 100 TB hot bins (traffic spikes)
    are AQE skew-join splittable because the key is synthetic and
    uniformizable by narrowing W.

    Timestamp columns must be numeric (cast upstream — epoch seconds);
    returns the inner-joined frame with both sides' columns, ``__bin``
    dropped.  Column names must not collide across sides."""
    w = float(lower_seconds) + float(upper_seconds)
    if w <= 0:
        raise ValueError("lower_seconds + upper_seconds must be positive")
    lts = F.col(left_ts).cast("double")
    rts = F.col(right_ts).cast("double")
    lo, hi = lts - F.lit(float(lower_seconds)), lts + F.lit(float(upper_seconds))
    l_ = left.withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(lo / F.lit(w)), F.floor(hi / F.lit(w)))),
    )
    r_ = right.withColumn("__bin", F.floor(rts / F.lit(w)))
    cond = (
        (l_["__bin"] == r_["__bin"])
        & (r_[right_ts].cast("double") >= l_[left_ts].cast("double") - F.lit(float(lower_seconds)))
        & (r_[right_ts].cast("double") <= l_[left_ts].cast("double") + F.lit(float(upper_seconds)))
    )
    return l_.join(r_, cond, "inner").drop("__bin")

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

from pyspark.sql import DataFrame
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

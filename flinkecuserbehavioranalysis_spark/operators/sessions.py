"""Sessionization (extension — BASELINE north star; the reference has no
session windows, SURVEY.md §2.4).

Batch formulation is gaps-and-islands: per key, a new session starts
where the gap to the previous event exceeds *gap_seconds*; the session id
is a running sum of start flags.  Two window functions over one shuffle
on the key — scales because per-key ordering is local to the key's
partition.  The streaming twin uses the native ``session_window``
(streaming/jobs.py), whose merge-able session state is what you want for
an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Return one row per (key, session): start/end epoch-seconds and
    event count."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    ts = F.col(ts_col).cast("double")
    prev = F.lag(ts).over(w)
    is_start = F.when(prev.isNull() | (ts - prev > F.lit(float(gap_seconds))), 1).otherwise(0)
    sess = (
        df.select(F.col(key_col), F.col(ts_col), *( [F.col(tiebreak_col)] if tiebreak_col else [] ))
        .withColumn("is_start", is_start)
        .withColumn("session_id", F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy(key_col, "session_id")
        .agg(
            F.min(F.col(ts_col)).cast("long").alias("session_start"),
            F.max(F.col(ts_col)).cast("long").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(key_col, "session_id", "session_start", "session_end", "n_events")
    )

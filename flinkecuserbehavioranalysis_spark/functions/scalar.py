"""Scalar function surface (SURVEY.md §2.9).

The reference's scalar usage is tiny — string split/trim, epoch
arithmetic, date parsing/formatting, a hand-rolled string hash
(UvWithBloomFilter.scala:98-105), UUID + random picks.  All are Spark
builtins; this module only hosts the composite helpers the query layer
shares, plus JSON extraction (an extension motivated by the testdata's
``events.props`` column — the reference has no JSON anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DAY = 86400


def floor_long(c: Column) -> Column:
    """Double epoch-seconds → whole-second long, FLOORING.

    ``double.cast("long")`` truncates toward zero, so pre-1970
    sub-second epochs (-0.75 → 0) diverge from both Spark's own
    ``timestamp.cast("long")`` (which floors: -0.75 → -1) and the
    DuckDB oracle's ``CAST(floor(epoch(ts)) AS BIGINT)``.  Every
    double→long epoch cast must route through here."""
    return F.floor(c).cast("long")


def floor_div(c: Column, n: int | Column) -> Column:
    """Floor division matching DuckDB ``//`` and ``F.window`` bucket
    starts.  ``(x / n).cast("long")`` truncates toward zero, which
    diverges on negative (pre-1970) epochs: -7139.52 days truncates
    to -7139 but floors to -7140."""
    d = n if isinstance(n, Column) else F.lit(n)
    return F.floor(c / d).cast("long")


def epoch_day(ts: str | Column) -> Column:
    """Epoch-day index (UTC) — the blacklist reset key
    (AdAnalysisByProvinceBlack.scala:82's next-midnight arithmetic
    ``(now/86400000+1)*86400000``, recast as a grouping column).
    Floor-divides so pre-1970 timestamps land in the right day."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return floor_div(c.cast("long"), _DAY)


def channel_from_user(user: str | Column, n_channels: int = 6) -> Column:
    """Deterministic channel surrogate (FIXTURES.md §7)."""
    from ..plans.queries import CHANNEL_CASE

    return F.expr(CHANNEL_CASE)


def url_from_props(props: str | Column = "props", buckets: int = 20) -> Column:
    """URL surrogate derived from the numeric field of ``props``."""
    c = F.col(props) if isinstance(props, str) else props
    return F.concat(
        F.lit("/page/"), (F.regexp_extract(c, "[0-9]+", 0).cast("int") % buckets).cast("string")
    )


def props_field(props: str | Column = "props", field: str = "k") -> Column:
    """Typed JSON field extraction from the events ``props`` column —
    ``get_json_object`` runs JVM-side (Jackson), no UDF."""
    c = F.col(props) if isinstance(props, str) else props
    return F.get_json_object(c, f"$.{field}")

"""Create→pay timeout analysis (SURVEY.md §2.8 F5-F6).

The reference implements this twice — a hand-rolled 4-way
``KeyedProcessFunction`` case analysis with timers
(OrderTimeoutDetect/OrderTimeout.scala:58-143) and a CEP
``create followedBy pay within 15m`` pattern
(OrderTimeoutWithOutCep.scala:45-58).  On a *completed* stream both
reduce to one conditional aggregation per order:

    min(ts where create)  as create_ts
    min(ts where pay)     as pay_ts
    CASE over (create_ts, pay_ts, pay_ts - create_ts <= timeout)

which is a single map-side-combinable shuffle on order_id — the CEP
NFA's relaxed contiguity ("followedBy") is automatic in min-aggregation.
Side outputs (OrderTimeout.scala:52,67) become a ``status`` column the
caller filters on.  The streaming twin (streaming/stateful.py) keeps the
timer-driven early-emission behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: status values — messages follow OrderTimeout.scala:85,106,112,131,139
PAY_OK = "payed successfully"
TIMEOUT = "order timeout"
PAID_AFTER_TIMEOUT = "payed but already timeout"
PAID_NO_CREATE = "already payed but not found created log"


def create_pay_status(
    df: DataFrame,
    id_col: str = "order_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    create_value: str = "create",
    pay_value: str = "pay",
    timeout_seconds: int = 900,
) -> DataFrame:
    """Per *id_col*: classify into the reference's 4 outcomes
    (OrderTimeout.scala:78-124).  The deadline is strict — a pay landing
    at exactly create + timeout is already late (OrderTimeout.scala:104
    fires the success branch only when ``payTime*1000 < timerTs``)."""
    ts = F.col(ts_col).cast("double")
    agg = df.groupBy(id_col).agg(
        F.min(F.when(F.col(type_col) == create_value, ts)).alias("create_ts"),
        F.min(F.when(F.col(type_col) == pay_value, ts)).alias("pay_ts"),
    )
    delta = F.col("pay_ts") - F.col("create_ts")
    status = (
        F.when(F.col("create_ts").isNull() & F.col("pay_ts").isNotNull(), F.lit(PAID_NO_CREATE))
        .when(F.col("pay_ts").isNull(), F.lit(TIMEOUT))
        .when(delta < F.lit(float(timeout_seconds)), F.lit(PAY_OK))
        .otherwise(F.lit(PAID_AFTER_TIMEOUT))
    )
    return agg.select(
        F.col(id_col),
        F.col("create_ts").cast("long").alias("create_ts"),
        F.col("pay_ts").cast("long").alias("pay_ts"),
        status.alias("status"),
    )

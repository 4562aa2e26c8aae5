"""Schema registry (SURVEY.md §1).

The reference fixes schemas at compile time as Scala case classes
(HotItemsAnalysis/HotItems.scala:28, NetworkFlowAnalysis/NetworkFlow.scala:30,
MarketAnalysis/AdStatisticsByGeo.scala:20, LoginFailDetect/LoginFailOne.scala:24,
OrderTimeoutDetect/OrderPayTxMatch.scala:20-21).  Here each input shape is a
``StructType`` used by the CSV readers in :mod:`.io`; the driver's parquet
testdata tables carry their own (richer) schemas, listed here for reference.

All timestamps are ``TimestampType`` (epoch-second Longs in the reference
are converted at read time with ``timestamp_seconds``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])  # type: ignore[arg-type]


# --- reference input record shapes (SURVEY.md §1.1) -----------------------

#: UserBehavior — HotItems.scala:28 (userId, itemId, categoryId, behavior, ts)
USER_BEHAVIOR = _st(
    ("user_id", LongType()),
    ("item_id", LongType()),
    ("category_id", IntegerType()),
    ("behavior", StringType()),
    ("ts", TimestampType()),
)

#: ApacheLogEvent — NetworkFlow.scala:30 (ip, userId, eventTime, method, url)
APACHE_LOG = _st(
    ("ip", StringType()),
    ("user_id", StringType()),
    ("event_time", TimestampType()),
    ("method", StringType()),
    ("url", StringType()),
)

#: AdClickEvent — AdStatisticsByGeo.scala:20
AD_CLICK = _st(
    ("user_id", LongType()),
    ("ad_id", LongType()),
    ("province", StringType()),
    ("city", StringType()),
    ("ts", TimestampType()),
)

#: MarketingUserBehavior — AppMarketingByChannel.scala:28
MARKETING_BEHAVIOR = _st(
    ("user_id", StringType()),
    ("behavior", StringType()),
    ("channel", StringType()),
    ("ts", TimestampType()),
)

#: LoginEvent — LoginFailOne.scala:24
LOGIN_EVENT = _st(
    ("user_id", LongType()),
    ("ip", StringType()),
    ("event_type", StringType()),
    ("ts", TimestampType()),
)

#: OrderEvent (4-field variant) — OrderPayTxMatch.scala:21; the 3-field
#: timeout variant (OrderTimeout.scala:21) simply ignores tx_id.
ORDER_EVENT = _st(
    ("order_id", LongType()),
    ("event_type", StringType()),
    ("tx_id", StringType()),
    ("ts", TimestampType()),
)

#: ReceiptEvent — OrderPayTxMatch.scala:20
RECEIPT_EVENT = _st(
    ("tx_id", StringType()),
    ("pay_channel", StringType()),
    ("ts", TimestampType()),
)


# --- driver testdata tables (TESTDATA.md) --------------------------------

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.8 — the Flink ``KeyedProcessFunction`` surface).

These are the streaming twins of the batch formulations in
``operators.patterns`` / ``operators.timeout``; keyed state plays the
role of Flink's ``ValueState``/``ListState`` and the timeout conf plays
the timers:

- **login-fail** (LoginFailTwo.scala:60-91): state = last event per
  user; a fail arriving ≤ gap after a stored fail emits a warning;
  success clears — identical to the reference's one-slot ListState.
- **order timeout** (OrderTimeout.scala:58-143): state = (create_ts,
  pay_ts); emit on the pairing event, or on event-time timeout at
  create_ts + deadline (``GroupStateTimeout.EventTimeTimeout`` — fired
  by watermark advance, exactly Flink's event-time timer discipline).

Rows inside a micro-batch are sorted by (ts, tiebreak) per key before
state transitions — Flink gets this ordering from per-key FIFO delivery;
Spark micro-batches need the explicit sort.

Watermark gotcha: a row whose event time equals the operator's current
watermark is dropped as late — in particular, epoch-0 timestamps die
against the initial watermark of 0.  Event-time timers fire on the
no-data micro-batch that follows the last data batch (watermark
propagation lags one batch), exactly like a Flink timer firing on
watermark advance.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LOGIN_WARNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_fail_ts", LongType()),
        StructField("last_fail_ts", LongType()),
        StructField("warning_msg", StringType()),
    ]
)
_LOGIN_STATE = StructType(
    [StructField("last_type", StringType()), StructField("last_ts", DoubleType())]
)

ORDER_RESULT_SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("create_ts", LongType()),
        StructField("pay_ts", LongType()),
        StructField("status", StringType()),
    ]
)
_ORDER_STATE = StructType(
    [StructField("create_ts", DoubleType()), StructField("pay_ts", DoubleType())]
)


def streaming_login_fail(
    events: DataFrame,
    fail_value: str = "error",
    max_gap_seconds: float = 3600.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.consecutive_fail_alerts``.
    Input columns: user_id, event_type, ts (+ event_id tiebreak)."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_type, last_ts = state.get if state.exists else (None, None)
        out: list[tuple[int, int, int, str]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"] if "event_id" in pdf else ["ts"])
            for _, row in pdf.iterrows():
                ts = row["ts"].timestamp()
                if row["event_type"] == fail_value:
                    if last_type == fail_value and ts - last_ts < max_gap_seconds:
                        out.append(
                            (
                                int(user_id),
                                int(last_ts),
                                int(ts),
                                "login fail 2 times in a short time",
                            )
                        )
                    last_type, last_ts = fail_value, ts
                else:
                    last_type, last_ts = "success", ts
        state.update((last_type, last_ts))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "first_fail_ts", "last_fail_ts", "warning_msg"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, LOGIN_WARNING_SCHEMA, _LOGIN_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


BLACKLIST_WARNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ad_id", LongType()),
        StructField("day", LongType()),
        StructField("warning_msg", StringType()),
    ]
)
_BLACKLIST_STATE = StructType(
    [
        StructField("day", LongType()),
        StructField("cnt", LongType()),
        StructField("sent", LongType()),
    ]
)


def streaming_blacklist(
    events: DataFrame,
    threshold: int = 100,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.blacklist_filter`` —
    the F1 ``KeyedProcessFunction`` (AdAnalysisByProvinceBlack.scala:69-109):
    per (user, ad) keep a running count + sent flag in state; emit ONE
    warning when the count first exceeds *threshold*.  The reference's
    midnight processing-time timer (:81-84) becomes an event-time day
    rollover in state — deterministic under replay, which a wall-clock
    timer is not.  Input columns: user_id, ad_id, ts."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, ad_id = key
        day, cnt, sent = state.get if state.exists else (None, 0, 0)
        out = []
        for pdf in pdfs:
            for _, row in pdf.sort_values("ts").iterrows():
                d = int(row["ts"].timestamp() // 86400)
                if day is None or d != day:
                    day, cnt, sent = d, 0, 0  # midnight state reset
                cnt += 1
                if cnt > threshold and not sent:
                    out.append(
                        (int(user_id), int(ad_id), day, f"Click over {threshold} times today")
                    )
                    sent = 1
        state.update((day, cnt, sent))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "ad_id", "day", "warning_msg"])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "ad_id")
        .applyInPandasWithState(
            fn, BLACKLIST_WARNING_SCHEMA, _BLACKLIST_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


def streaming_order_timeout(
    order_events: DataFrame,
    timeout_seconds: float = 900.0,
    watermark: str = "5 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.timeout.create_pay_status``.
    Input columns: order_id, event_type ('create'|'pay'), ts."""
    from ..operators.timeout import PAID_AFTER_TIMEOUT, PAID_NO_CREATE, PAY_OK, TIMEOUT

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        if state.hasTimedOut:
            create_ts, pay_ts = state.get
            status = TIMEOUT if pay_ts is None else PAID_NO_CREATE
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        int(order_id),
                        None if create_ts is None else int(create_ts),
                        None if pay_ts is None else int(pay_ts),
                        status,
                    )
                ],
                columns=["order_id", "create_ts", "pay_ts", "status"],
            )
            return
        create_ts, pay_ts = state.get if state.exists else (None, None)
        for pdf in pdfs:
            for _, row in pdf.sort_values("ts").iterrows():
                ts = row["ts"].timestamp()
                if row["event_type"] == "create":
                    create_ts = ts if create_ts is None else min(create_ts, ts)
                else:
                    pay_ts = ts if pay_ts is None else min(pay_ts, ts)
        if create_ts is not None and pay_ts is not None:
            status = PAY_OK if pay_ts - create_ts < timeout_seconds else PAID_AFTER_TIMEOUT
            state.remove()
            yield pd.DataFrame(
                [(int(order_id), int(create_ts), int(pay_ts), status)],
                columns=["order_id", "create_ts", "pay_ts", "status"],
            )
        else:
            # one pending side — arm the event-time timer (Flink:
            # OrderTimeout.scala:90-92 create+15min / :116-123 pay-alone)
            state.update((create_ts, pay_ts))
            anchor = create_ts if create_ts is not None else pay_ts
            state.setTimeoutTimestamp(int((anchor + timeout_seconds) * 1000))

    return (
        order_events.withWatermark("ts", watermark)
        .groupBy("order_id")
        .applyInPandasWithState(
            fn, ORDER_RESULT_SCHEMA, _ORDER_STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def streaming_login_fail_tws(
    events: DataFrame,
    fail_value: str = "error",
    max_gap_seconds: float = 3600.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``streaming_login_fail`` —
    the successor stateful API (typed per-key state handles instead of a
    single state tuple; the long-term home for F1-F5-style operators).
    Same semantics: one-slot last-event state per user, warning when two
    fails land within *max_gap_seconds*.

    Runtime dependency: TWS's state-server wire protocol imports
    ``google.protobuf`` in the Python driver worker; environments
    without it must use ``streaming_login_fail`` (identical results,
    applyInPandasWithState transport)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class LoginFail(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", _LOGIN_STATE)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            (user_id,) = key
            stored = self._last.get() if self._last.exists() else None
            last_type, last_ts = stored if stored is not None else (None, None)
            out: list[tuple[int, int, int, str]] = []
            for pdf in rows:
                sort_cols = ["ts", "event_id"] if "event_id" in pdf else ["ts"]
                for _, row in pdf.sort_values(sort_cols).iterrows():
                    ts = row["ts"].timestamp()
                    if row["event_type"] == fail_value:
                        if last_type == fail_value and ts - last_ts < max_gap_seconds:
                            out.append(
                                (
                                    int(user_id),
                                    int(last_ts),
                                    int(ts),
                                    "login fail 2 times in a short time",
                                )
                            )
                        last_type, last_ts = fail_value, ts
                    else:
                        last_type, last_ts = "success", ts
            self._last.update((last_type, last_ts))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "first_fail_ts", "last_fail_ts", "warning_msg"]
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=LoginFail(),
            outputStructType=LOGIN_WARNING_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def streaming_as_of_enrich(
    tagged: DataFrame,
    key: str,
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("rid",),
    left_cols: tuple[str, ...] = ("lid",),
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.joins.as_of_join``: enrich each
    left row with the most recent right payload at-or-before it.

    Input is a union-tagged stream (``__tag`` 0 = right/reference side,
    1 = left/probe side — the J2 connect pattern); keyed state holds the
    latest right (ts, payload).  Within a micro-batch rows process in
    (ts, __tag) order, right-before-left at equal timestamps, matching
    the batch operator's <= visibility; across batches the state carries
    the running latest right row, so time-ordered replays (file sources,
    Kafka per-key order) reproduce the batch result exactly.

    Output: key, left ts, *left_cols, *payload_cols (NULLs before the
    first right row).  Payload columns are integer-long by contract
    (the output schema is LongType) and are carried through LongType
    state — no state-side float round-trip.  One residual precision
    caveat: if the tagged input leaves payload slots NULL on left rows
    (they are never read), Arrow→pandas widens the whole column to
    float64 inside the micro-batch, so payload values above 2^53 also
    need the caller to fill those never-read slots with a non-null
    sentinel (e.g. 0) to keep the column int64 end-to-end."""
    from pyspark.sql.types import DoubleType, StructType

    n_pay = len(payload_cols)
    state_schema = StructType(
        [StructField("r_ts", DoubleType())]
        + [StructField(f"p{i}", LongType()) for i in range(n_pay)]
    )
    out_schema = StructType(
        [
            StructField(key, LongType()),
            StructField("ts", LongType()),
        ]
        + [StructField(c, LongType()) for c in left_cols]
        + [StructField(c, LongType()) for c in payload_cols]
    )

    def fn(key_t, pdfs, state):
        stored = state.get if state.exists else (None,) * (1 + n_pay)
        r_ts, pays = stored[0], list(stored[1:])
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, "__tag"])
            for _, row in pdf.iterrows():
                if row["__tag"] == 0:
                    r_ts = row[ts_col].timestamp()
                    pays = [int(row[c]) for c in payload_cols]
                else:
                    out.append(
                        (int(key_t[0]), int(row[ts_col].timestamp()))
                        + tuple(int(row[c]) for c in left_cols)
                        + tuple(pays)
                    )
        state.update((r_ts, *pays))
        if out:
            yield pd.DataFrame(
                out, columns=[key, "ts", *left_cols, *payload_cols]
            )

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


PATTERN_PAIR_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("first_ts", LongType()),
        StructField("second_ts", LongType()),
    ]
)
_PATTERN_STATE = StructType(
    [
        StructField("last_a", LongType()),      # strict: 1 if previous event matched A
        StructField("last_ts", DoubleType()),   # strict: previous event time
        StructField("pending", StringType()),   # relaxed: ','-joined pending A times
    ]
)


def streaming_pattern_pairs(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    first_pred,
    second_pred,
    within_seconds: float,
    contiguity: str = "relaxed",
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.pattern_pairs`` — the
    parameterized CEP ``begin/next|followedBy/within`` surface over
    ``applyInPandasWithState``.

    State per key:

    - strict (``next``): the previous event's (matched-A?, ts) — one
      slot, exactly LoginFailTwo's ListState discipline.
    - relaxed (``followedBy``): the pending unmatched-A timestamps.  On
      a B at time tb, the FIRST B after each A is by definition the
      earliest, so every pending A either matches now (tb - ta <
      within) or can never match (any later B is later still) — the
      list empties on every B, which is what bounds the state: its
      length is ≤ the longest A-run between two B events.

    The time bound is strict (<), matching the batch operator and CEP's
    end-exclusive ``within``.  Output: (key, first_ts, second_ts) as
    epoch-second longs — identical to the batch operator on a
    time-ordered replay (see test_streaming_pattern_pairs_matches_batch).
    """
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(f"contiguity must be 'strict' or 'relaxed', got {contiguity!r}")
    tagged = events.withColumn("__a", first_pred.cast("int")).withColumn(
        "__b", second_pred.cast("int")
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    strict = contiguity == "strict"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        last_a, last_ts, pending_s = state.get if state.exists else (0, None, "")
        pending = [float(x) for x in pending_s.split(",") if x] if pending_s else []
        out: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            cols = [c for c in sort_cols if c in pdf.columns]
            for _, row in pdf.sort_values(cols).iterrows():
                ts = row[ts_col].timestamp()
                is_a, is_b = bool(row["__a"]), bool(row["__b"])
                if strict:
                    if is_b and last_a and ts - last_ts < within_seconds:
                        out.append((int(k), int(last_ts), int(ts)))
                    last_a, last_ts = (1 if is_a else 0), ts
                else:
                    if is_b:
                        out.extend(
                            (int(k), int(ta), int(ts))
                            for ta in pending
                            if ts - ta < within_seconds
                        )
                        pending = []
                    if is_a:
                        pending.append(ts)
        state.update((last_a, last_ts, ",".join(repr(t) for t in pending)))
        if out:
            yield pd.DataFrame(out, columns=["key", "first_ts", "second_ts"])

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, PATTERN_PAIR_SCHEMA, _PATTERN_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )

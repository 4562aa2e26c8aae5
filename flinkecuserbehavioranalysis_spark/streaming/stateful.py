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

Rows inside a micro-batch are buffered to ONE frame per key and sorted
by (ts, tiebreak) before state transitions (``_group_chunks``) — Flink
gets this ordering from per-key FIFO delivery; Spark's shuffle delivers
a group as arbitrarily-ordered Arrow slices, so per-slice sorting alone
breaks once a group straddles a slice boundary (round-8 sf1 finding).

Hot-path discipline: every operator here extracts the pandas frame's
columns to numpy arrays ONCE per batch (``.astype('int64')`` epoch-ns →
float seconds) and loops over plain scalars — never ``iterrows`` (whose
per-row Series construction is ~100× the cost of the transition itself).
Transitions that are order-free (min/max) or expressible as segment
boundaries vectorize fully; inherently sequential ones (pending-list
CEP state) keep a scalar loop over the numpy views.

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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _epoch_s(col: pd.Series) -> np.ndarray:
    """datetime64[ns] column → float epoch seconds, one vectorized cast
    (the array analog of ``pd.Timestamp.timestamp()``)."""
    return col.astype("int64").to_numpy() / 1e9


def _floor_s(x) -> int:
    """Float epoch seconds → floored whole-second long.  Python ``int()``
    truncates toward zero, which diverges from the batch floor contract
    (functions/scalar.floor_long) on pre-1970 sub-second rows — every
    kernel's epoch EMISSION routes through here (gap comparisons stay at
    full double precision, matching the batch kernels)."""
    return int(np.floor(x))


def _tag(pred: F.Column) -> F.Column:
    """NULL-safe predicate tag column for the pattern kernels.

    A three-valued predicate (``event_type == 'view'`` over a NULL
    type) evaluates to NULL; bare ``pred.cast("int")`` carries that
    NULL through Arrow as NaN, and the kernels' ``astype(bool)`` turns
    NaN into **True** — silently inverting the batch compilers'
    NULL-is-a-NON-match semantics (found by the round-8 degenerate-tier
    probe of streaming_cep_replay).  Coalescing to false pins the
    batch behavior at the tag site, once, for every kernel."""
    return F.coalesce(pred.cast("boolean"), F.lit(False)).cast("int")


def _group_chunks(pdfs: Iterator[pd.DataFrame], sort_cols: list) -> Iterator[pd.DataFrame]:
    """Yield a key's micro-batch group as ONE time-sorted frame.

    ``applyInPandasWithState`` delivers a group as Arrow-batch slices in
    shuffle-arrival order.  Sorting each slice independently is only
    correct while the whole group fits one Arrow batch (always true at
    test SF); once the grouped partition exceeds ``maxRecordsPerBatch``
    (~10k rows), a group can straddle slice boundaries whose RELATIVE
    order is arbitrary, and a sequential kernel would replay events out
    of time order (found by the round-8 sf1 sweep: the union-tagged
    as-of replay read stale right-side state on exactly the keys whose
    group straddled a batch boundary).  Buffering the whole group — per
    key per MICRO-BATCH, never per stream — is the documented
    ProcessWindowFunction-style memory bound these kernels already
    carry.  Sort columns absent from the frame are dropped; a timer-only
    invocation (no data chunks) yields nothing."""
    frames = list(pdfs)
    if not frames:
        return
    pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
    cols = [c for c in sort_cols if c in pdf.columns]
    yield pdf.sort_values(cols) if cols else pdf


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
        for pdf in _group_chunks(pdfs, ["ts", "event_id"]):
            tss = _epoch_s(pdf["ts"])
            is_fail = (pdf["event_type"] == fail_value).to_numpy()
            # batch-interior pairs vectorize: previous row is a fail and
            # the gap is short; the batch boundary uses carried state
            prev_fail = np.concatenate(([last_type == fail_value], is_fail[:-1]))
            prev_ts = np.concatenate(
                ([last_ts if last_ts is not None else np.nan], tss[:-1])
            )
            hit = is_fail & prev_fail & (tss - prev_ts < max_gap_seconds)
            out.extend(
                (int(user_id), _floor_s(prev_ts[i]), _floor_s(tss[i]), "login fail 2 times in a short time")
                for i in np.flatnonzero(hit)
            )
            if len(tss):
                last_type = fail_value if is_fail[-1] else "success"
                last_ts = float(tss[-1])
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
        for pdf in _group_chunks(pdfs, ["ts"]):
            # integer day ids straight from epoch-ns — the count per day
            # is order-free, so the loop runs over DAY SEGMENTS, not rows
            days = pdf["ts"].astype("int64").to_numpy() // (86400 * 1_000_000_000)
            if not len(days):
                continue
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(days)) + 1, [len(days)]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                d = int(days[s])
                if day is None or d != day:
                    day, cnt, sent = d, 0, 0  # midnight state reset
                cnt += int(e - s)
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
                        None if create_ts is None else _floor_s(create_ts),
                        None if pay_ts is None else _floor_s(pay_ts),
                        status,
                    )
                ],
                columns=["order_id", "create_ts", "pay_ts", "status"],
            )
            return
        create_ts, pay_ts = state.get if state.exists else (None, None)
        for pdf in pdfs:
            # state is (min create, min pay) — order-free, no sort needed
            tss = _epoch_s(pdf["ts"])
            is_create = (pdf["event_type"] == "create").to_numpy()
            c, p = tss[is_create], tss[~is_create]
            if c.size:
                create_ts = float(c.min()) if create_ts is None else min(create_ts, float(c.min()))
            if p.size:
                pay_ts = float(p.min()) if pay_ts is None else min(pay_ts, float(p.min()))
        if create_ts is not None and pay_ts is not None:
            status = PAY_OK if pay_ts - create_ts < timeout_seconds else PAID_AFTER_TIMEOUT
            state.remove()
            yield pd.DataFrame(
                [(int(order_id), _floor_s(create_ts), _floor_s(pay_ts), status)],
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
            for pdf in _group_chunks(rows, ["ts", "event_id"]):
                tss = _epoch_s(pdf["ts"])
                is_fail = (pdf["event_type"] == fail_value).to_numpy()
                prev_fail = np.concatenate(([last_type == fail_value], is_fail[:-1]))
                prev_ts = np.concatenate(
                    ([last_ts if last_ts is not None else np.nan], tss[:-1])
                )
                hit = is_fail & prev_fail & (tss - prev_ts < max_gap_seconds)
                out.extend(
                    (int(user_id), _floor_s(prev_ts[i]), _floor_s(tss[i]),
                     "login fail 2 times in a short time")
                    for i in np.flatnonzero(hit)
                )
                if len(tss):
                    last_type = fail_value if is_fail[-1] else "success"
                    last_ts = float(tss[-1])
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
        k0 = int(key_t[0])
        for pdf in _group_chunks(pdfs, [ts_col, "__tag"]):
            tss = _epoch_s(pdf[ts_col])
            is_right = (pdf["__tag"].to_numpy() == 0)
            # forward-fill: index of the latest right row at-or-before
            # each position (-1 = none yet in this batch → carried state)
            last_right = np.maximum.accumulate(
                np.where(is_right, np.arange(len(pdf)), -1)
            )
            pay_arr = {c: pdf[c].to_numpy() for c in payload_cols}
            left_arr = {c: pdf[c].to_numpy() for c in left_cols}
            for pos in np.flatnonzero(~is_right):
                j = last_right[pos]
                cur = [int(pay_arr[c][j]) for c in payload_cols] if j >= 0 else pays
                out.append(
                    (k0, _floor_s(tss[pos]))
                    + tuple(int(left_arr[c][pos]) for c in left_cols)
                    + tuple(cur)
                )
            if is_right.any():
                j = int(np.flatnonzero(is_right)[-1])
                r_ts = float(tss[j])
                pays = [int(pay_arr[c][j]) for c in payload_cols]
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


FAIL_BURST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_fail_ts", LongType()),
        StructField("last_fail_ts", LongType()),
        StructField("n_fails", LongType()),
        StructField("warning_msg", StringType()),
    ]
)
_FAIL_BURST_STATE = StructType(
    [
        StructField("anchor", DoubleType()),   # first fail of the open run
        StructField("fails", StringType()),    # ','-joined fail times in [anchor, anchor+W]
        StructField("done", LongType()),       # 1 = timer fired for this run
    ]
)


def streaming_fail_burst(
    events: DataFrame,
    fail_value: str = "error",
    window_seconds: float = 3600.0,
    min_fails: int = 2,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.fail_burst_alerts`` — the
    LoginFailOne.scala:62-106 timer-buffer variant, the surface the
    reference exercises hardest: buffer fails per user in ListState,
    arm an event-time timer at first_fail + window (:74), emit on the
    timer if ≥ *min_fails* accumulated, success clears (:79-81).

    State machine per user (event-time order within a batch):

    - success → FLUSH the pending run (emit if ≥ *min_fails* buffered),
      then reset — the fail set in [anchor, anchor+window] is final the
      moment a success lands, so emitting early is exact.  (The
      reference's literal ListState clear at LoginFailOne.scala:79-81
      silently drops a qualifying burst when the success beats the
      timer; the batch twin counts such runs, so this twin does too.)
    - fail, no anchor → anchor it, buffer it, arm the timer at
      anchor + window (``GroupStateTimeout.EventTimeTimeout`` — fired
      by watermark advance, Flink's event-time timer discipline).
    - fail inside [anchor, anchor+window] → buffer it.
    - fail past the window → ignored (the reference's timer has
      conceptually fired; the batch twin drops these too).
    - timeout → emit (anchor, max buffered, count) if count ≥
      *min_fails*; mark the run ``done`` so later fails stay ignored
      until the next success — exactly the batch operator's one-row-
      per-run contract.

    A run whose timer the final watermark never passes (anchor +
    window ≥ max event time) stays pending — the bounded-replay test
    filters the batch twin the same way.  Input columns: user_id,
    event_type, ts (+ event_id tiebreak).  Output = batch schema:
    (user_id, first_fail_ts, last_fail_ts, n_fails, warning_msg)."""

    msg = f"login fail {min_fails} times in {int(window_seconds)}s"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            anchor, fails_s, done = state.get
            fails = [float(x) for x in fails_s.split(",") if x] if fails_s else []
            if not done and len(fails) >= min_fails:
                yield pd.DataFrame(
                    [(int(user_id), _floor_s(anchor), _floor_s(max(fails)), len(fails), msg)],
                    columns=["user_id", "first_fail_ts", "last_fail_ts", "n_fails", "warning_msg"],
                )
            # run stays closed (done=1) until a success resets it; no
            # timer re-arm — state is one tuple per user, bounded
            state.update((anchor, "", 1))
            return
        anchor, fails_s, done = state.get if state.exists else (None, "", 0)
        fails = [float(x) for x in fails_s.split(",") if x] if fails_s else []
        out = []
        for pdf in _group_chunks(pdfs, ["ts", "event_id"]):
            tss = _epoch_s(pdf["ts"])
            # NULL event_type counts as a FAIL — the batch twin's
            # success predicate is `event_type <> fail`, which NULL
            # fails (oracle CASE -> 0); treating NULL as success here
            # flushed runs early on NULL-bearing tiers
            is_fail = (
                (pdf["event_type"] == fail_value) | pdf["event_type"].isna()
            ).to_numpy()
            for i in range(len(tss)):
                ts = float(tss[i])
                if not is_fail[i]:
                    if anchor is not None and not done and len(fails) >= min_fails:
                        out.append(
                            (int(user_id), _floor_s(anchor), _floor_s(max(fails)), len(fails), msg)
                        )
                    anchor, fails, done = None, [], 0
                elif done:
                    continue
                elif anchor is None:
                    anchor, fails = ts, [ts]
                elif ts <= anchor + window_seconds:
                    fails.append(ts)
        state.update((anchor, ",".join(repr(t) for t in fails), done))
        if anchor is not None and not done:
            state.setTimeoutTimestamp(int((anchor + window_seconds) * 1000))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "first_fail_ts", "last_fail_ts", "n_fails", "warning_msg"],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, FAIL_BURST_SCHEMA, _FAIL_BURST_STATE, "append", GroupStateTimeout.EventTimeTimeout
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
    - relaxed (``followedBy``): the pending unmatched-A timestamps.
      The list is PRUNED on every event: an A older than *within* can
      never match (any future B is later still), and on a B every
      surviving A matches and the list empties.  State is therefore
      bounded by the key's A-arrival rate × the within window — also
      for keys that never see a B (the common view-without-purchase
      case), which a B-only cleanup would grow forever.

    The time bound is strict (<), matching the batch operator and CEP's
    end-exclusive ``within``.  Output: (key, first_ts, second_ts) as
    epoch-second longs — identical to the batch operator on a
    time-ordered replay (see test_streaming_pattern_pairs_matches_batch).
    """
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(f"contiguity must be 'strict' or 'relaxed', got {contiguity!r}")
    tagged = events.withColumn("__a", _tag(first_pred)).withColumn(
        "__b", _tag(second_pred)
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
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            a_arr = pdf["__a"].to_numpy().astype(bool)
            b_arr = pdf["__b"].to_numpy().astype(bool)
            if strict:
                # batch-interior (prev, cur) pairs vectorize; the batch
                # boundary pair uses the carried one-slot state
                prev_a = np.concatenate(([bool(last_a)], a_arr[:-1]))
                prev_ts = np.concatenate(
                    ([last_ts if last_ts is not None else np.nan], tss[:-1])
                )
                hit = b_arr & prev_a & (tss - prev_ts < within_seconds)
                out.extend(
                    (int(k), _floor_s(prev_ts[i]), _floor_s(tss[i])) for i in np.flatnonzero(hit)
                )
                if len(tss):
                    last_a, last_ts = (1 if a_arr[-1] else 0), float(tss[-1])
            else:
                for i in range(len(tss)):
                    ts = float(tss[i])
                    if pending:
                        # prune A's that can no longer match: any future
                        # B is >= ts, so expiry is decidable NOW
                        pending = [ta for ta in pending if ts - ta < within_seconds]
                    if b_arr[i]:
                        out.extend((int(k), _floor_s(ta), _floor_s(ts)) for ta in pending)
                        pending = []
                    if a_arr[i]:
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

_SEQUENCE_STATE = StructType([StructField("chains", StringType())])


def streaming_pattern_sequence(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list,
    within_seconds: float,
    contiguity: str = "relaxed",
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.pattern_sequence`` — the
    N-step CEP chain as a keyed NFA over ``applyInPandasWithState``.

    State per key: the active partial chains (each a ts-list at step
    k < N).  Per event, in (ts, tiebreak) order:

    1. PRUNE doomed chains (ts − t1 ≥ within: any completion is later
       still) — state stays bounded by the key's step-1 arrival rate ×
       the within window, also for keys that never complete.
    2. Advance: a chain waiting at step k advances when the event
       matches step k+1 (relaxed), or advances-or-dies on it (strict —
       at most N−1 strict chains can ever be live, one per step).
       A chain advances at most one step per event ("strictly later").
    3. A chain reaching step N emits (within already guaranteed by 1).
    4. An event matching step 1 starts a new chain.

    Greedy first-match advancement equals the batch operator's
    lexicographically-earliest chain ONLY under uniform contiguity
    (relaxed continuations are monotone: if any later completion
    exists, the earliest matching event also completes; strict chains
    have no choice at all).  Mixed per-gap policies would need
    lookahead a streaming NFA cannot commit to greedily, so they are
    rejected — use the batch operator for those.  Output: (key,
    step1_ts … stepN_ts) epoch-second longs, identical to the batch
    operator on a bounded ordered replay
    (tests/test_streaming.py::test_streaming_pattern_sequence_matches_batch).
    """
    n = len(steps)
    if n < 2:
        raise ValueError(f"streaming_pattern_sequence needs >= 2 steps, got {n}")
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(
            "streaming twin supports uniform 'strict' or 'relaxed' contiguity only, "
            f"got {contiguity!r} (mixed per-gap policies need the batch operator)"
        )
    tagged = events
    for i, pred in enumerate(steps):
        tagged = tagged.withColumn(f"__m{i}", _tag(pred))
    out_schema = StructType(
        [StructField("key", LongType())]
        + [StructField(f"step{i + 1}_ts", LongType()) for i in range(n)]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    strict = contiguity == "strict"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        (chains_s,) = state.get if state.exists else ("",)
        chains = [
            [float(x) for x in c.split(",")] for c in chains_s.split(";") if c
        ]
        out: list[tuple[int, ...]] = []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            m = [pdf[f"__m{i}"].to_numpy().astype(bool) for i in range(n)]
            for i in range(len(tss)):
                ts = float(tss[i])
                nxt: list[list[float]] = []
                for c in chains:
                    if ts - c[0] >= within_seconds:
                        continue  # doomed: prune on every event
                    if m[len(c)][i]:
                        c2 = c + [ts]
                        if len(c2) == n:
                            out.append((int(k), *(_floor_s(t) for t in c2)))
                        else:
                            nxt.append(c2)
                    elif not strict:
                        nxt.append(c)
                chains = nxt
                if m[0][i]:
                    chains.append([ts])
        state.update((";".join(",".join(repr(t) for t in c) for c in chains),))
        if out:
            yield pd.DataFrame(
                out, columns=["key"] + [f"step{j + 1}_ts" for j in range(n)]
            )

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, _SEQUENCE_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


def streaming_pattern_sequence_optional(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list,
    within_seconds: float,
    optional,
    contiguity: str = "relaxed",
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.pattern_sequence_optional``
    — CEP ``optional()`` over ONE keyed NFA.  The batch operator's
    expansion semantics (a match per subset of skipped optional steps)
    can't be a union of per-expansion ``streaming_pattern_sequence``
    queries — Spark forbids multiple ``applyInPandasWithState``
    operators in one streaming query — so a single stateful function
    tracks every expansion's pending chains side by side: the state is
    the per-expansion chain lists (each pruned by the within bound
    exactly like the base NFA), each event drives every expansion's
    transition, and a completing chain emits the full-width row with
    NULLs at that expansion's skipped positions.  One state store, one
    shuffle — cheaper than the batch expansion's ≤ 2^(#optional)
    passes.  Uniform *contiguity* only, expansions keeping < 2 steps
    are not tracked — both exactly as in the batch operator.  Output:
    (key, step1_ts … stepN_ts), identical to the batch operator on a
    bounded ordered replay."""
    from itertools import combinations

    n = len(steps)
    if n < 2:
        raise ValueError(f"needs >= 2 steps, got {n}")
    if contiguity not in ("strict", "relaxed"):
        raise ValueError(
            "streaming twin supports uniform 'strict' or 'relaxed' contiguity only, "
            f"got {contiguity!r}"
        )
    if len(optional) != n:
        raise ValueError(f"optional flags ({len(optional)}) must match steps ({n})")
    opt_idx = [i for i, o in enumerate(optional) if o]
    expansions: list[tuple[int, ...]] = []
    for r in range(len(opt_idx) + 1):
        for drop in combinations(opt_idx, r):
            keep = tuple(i for i in range(n) if i not in drop)
            if len(keep) >= 2:
                expansions.append(keep)
    if not expansions:
        raise ValueError("no expansion keeps >= 2 steps")
    tagged = events
    for i, pred in enumerate(steps):
        tagged = tagged.withColumn(f"__m{i}", _tag(pred))
    out_schema = StructType(
        [StructField("key", LongType())]
        + [StructField(f"step{i + 1}_ts", LongType()) for i in range(n)]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    strict = contiguity == "strict"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        (s,) = state.get if state.exists else ("",)
        parts = s.split("|") if s else []
        if len(parts) != len(expansions):
            parts = ["" for _ in expansions]
        chain_sets = [
            [[float(x) for x in c.split(",")] for c in p.split(";") if c]
            for p in parts
        ]
        out: list[tuple] = []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            m = [pdf[f"__m{i}"].to_numpy().astype(bool) for i in range(n)]
            for i in range(len(tss)):
                ts = float(tss[i])
                for ei, keep in enumerate(expansions):
                    chains = chain_sets[ei]
                    nxt: list[list[float]] = []
                    for c in chains:
                        if ts - c[0] >= within_seconds:
                            continue  # doomed: prune on every event
                        if m[keep[len(c)]][i]:
                            c2 = c + [ts]
                            if len(c2) == len(keep):
                                row: list = [int(k)] + [None] * n
                                for pos, oi in enumerate(keep):
                                    row[oi + 1] = _floor_s(c2[pos])
                                out.append(tuple(row))
                            else:
                                nxt.append(c2)
                        elif not strict:
                            nxt.append(c)
                    chains = nxt
                    if m[keep[0]][i]:
                        chains.append([ts])
                    chain_sets[ei] = chains
        state.update(
            (
                "|".join(
                    ";".join(",".join(repr(t) for t in c) for c in chains)
                    for chains in chain_sets
                ),
            )
        )
        if out:
            yield pd.DataFrame(
                out, columns=["key"] + [f"step{j + 1}_ts" for j in range(n)]
            )

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, _SEQUENCE_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


NFB_SCHEMA = StructType(
    [StructField("key", LongType()), StructField("first_ts", LongType())]
)

_NFB_STATE = StructType(
    [StructField("pending", StringType()), StructField("absents", StringType())]
)


def streaming_not_followed_by(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    first_pred,
    absent_pred,
    within_seconds: float,
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.pattern_not_followed_by``
    — CEP negation (``notFollowedBy...within``) as keyed state.

    Negation is decided by TIME, not by data: a first-event survives
    only once the watermark proves no killer can still arrive.  State
    per key, both lists PRUNED every call:

    - ``pending`` — undecided first-event timestamps.  A new one is
      admitted only if no stored absent already kills it (stored
      absents may be LATER than an out-of-order first event).  Emitted
      (and dropped) once ``first_ts + within <= watermark`` — every
      event at or below the watermark has been delivered, so no killer
      with ``absent_ts < first_ts + within`` can still appear; killed
      entries drop immediately.  Bounded by first-rate × (within +
      watermark delay).
    - ``absents`` — killer timestamps still above the watermark (a
      future first event must have ts > watermark, so only those can
      kill it).  Bounded by absent-rate × watermark delay.

    Survival emission rides ``EventTimeTimeout``: the earliest pending
    deadline arms a timer, so quiet keys flush on watermark advance
    (the trailing no-data micro-batch) exactly like a Flink event-time
    timer; a key with neither list non-empty removes its state.  The
    kill window is the batch operator's value-ordered end-exclusive
    ``first_ts < absent_ts < first_ts + within`` — equal-ts killers
    don't kill, so in-batch sort order never changes the outcome."""
    tagged = events.withColumn("__a", _tag(first_pred)).withColumn(
        "__b", _tag(absent_pred)
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def _parse(s: str | None) -> list[float]:
        return [float(x) for x in s.split(",") if x] if s else []

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            pending_s, absents_s = state.get
            pending, absents = _parse(pending_s), _parse(absents_s)
        else:
            pending, absents = [], []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            a_arr = pdf["__a"].to_numpy().astype(bool)
            b_arr = pdf["__b"].to_numpy().astype(bool)
            for i in range(len(tss)):
                ts = float(tss[i])
                if b_arr[i]:
                    pending = [
                        v for v in pending if not (v < ts < v + within_seconds)
                    ]
                    absents.append(ts)
                if a_arr[i]:
                    if not any(ts < at < ts + within_seconds for at in absents):
                        pending.append(ts)
        wm_s = state.getCurrentWatermarkMs() / 1000.0
        survived = sorted(v for v in pending if v + within_seconds <= wm_s)
        pending = [v for v in pending if v + within_seconds > wm_s]
        absents = [at for at in absents if at > wm_s]
        if pending or absents:
            state.update(
                (
                    ",".join(repr(t) for t in pending),
                    ",".join(repr(t) for t in absents),
                )
            )
            if pending:
                deadline_ms = int(min(v + within_seconds for v in pending) * 1000)
            else:
                # absent-only state: self-clean once these can't kill
                deadline_ms = int((max(absents) + 1.0) * 1000)
            state.setTimeoutTimestamp(max(deadline_ms, int(wm_s * 1000) + 1))
        elif state.exists:
            state.remove()
        if survived:
            yield pd.DataFrame(
                [(int(k), int(v)) for v in survived], columns=["key", "first_ts"]
            )

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, NFB_SCHEMA, _NFB_STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("day", StringType()),
        StructField("step", IntegerType()),
        StructField("step_ts", LongType()),
    ]
)

_FUNNEL_STATE = StructType(
    [
        StructField("t0", DoubleType()),
        StructField("t1", DoubleType()),
        StructField("t2", DoubleType()),
    ]
)


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.funnel_conversion`` (3-step
    form): keyed by (user, day), state = the three first-touch anchors.

    On a time-ordered stream the greedy transition — take a step event
    iff the step is unclaimed and the previous anchor is strictly
    earlier — selects exactly the batch operator's conditional-min
    chain, so a bounded replay reproduces the batch funnel (asserted in
    tests/test_streaming.py).  One row is emitted per step advancement
    (update-style progress feed); aggregating max(step) per (user, day)
    gives the batch reach counts.  State is three scalar slots per
    active (user, day) — bounded, watermark-evictable."""
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    tagged = events.select(
        F.col(key_col), day.alias("__day"), F.col(type_col), F.col(ts_col)
    )
    step_idx = {s: i for i, s in enumerate(steps)}

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        u, d = key
        t: list[float | None] = list(state.get) if state.exists else [None, None, None]
        out: list[tuple[int, str, int, int]] = []
        for pdf in _group_chunks(pdfs, [ts_col]):
            tss = _epoch_s(pdf[ts_col])
            types = pdf[type_col].to_numpy()
            for ts, et in zip(tss, types):
                i = step_idx.get(et)
                if i is None or t[i] is not None:
                    continue
                if i == 0 or (t[i - 1] is not None and float(ts) > t[i - 1]):
                    t[i] = float(ts)
                    out.append((int(u), str(d), i + 1, _floor_s(ts)))
        state.update(tuple(t))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "day", "step", "step_ts"])

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col, "__day")
        .applyInPandasWithState(
            fn, FUNNEL_SCHEMA, _FUNNEL_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


ONE_OR_MORE_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("first_a_ts", LongType()),
        StructField("b_ts", LongType()),
        StructField("n_a", LongType()),
    ]
)
_ONE_OR_MORE_STATE = StructType(
    [
        StructField("run_len", LongType()),
        StructField("first_a", DoubleType()),
    ]
)


def streaming_one_or_more(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    a_pred,
    b_pred,
    within_seconds: float,
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.patterns.pattern_one_or_more`` —
    the CEP loop state an NFA keeps for ``oneOrMore().consecutive()``
    is literally TWO numbers per key: the length of the current
    trailing consecutive-A run and its first timestamp.  Per event in
    (ts, tiebreak) order: A extends (or starts) the run; B with a live
    run emits (first_a, b_ts, len) when the bound holds, and — being a
    non-A — ends the run; anything else resets.  Constant-size state,
    no buffered prefixes, no pruning needed."""
    tagged = events.withColumn("__a", _tag(a_pred)).withColumn(
        "__b", _tag(b_pred)
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        run_len, first_a = state.get if state.exists else (0, 0.0)
        out: list[tuple[int, int, int, int]] = []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            is_b = pdf["__b"].to_numpy().astype(bool)
            is_a = pdf["__a"].to_numpy().astype(bool) & ~is_b
            for i in range(len(tss)):
                ts = float(tss[i])
                if is_a[i]:
                    if run_len == 0:
                        first_a = ts
                    run_len += 1
                    continue
                if is_b[i] and run_len >= 1 and ts <= first_a + within_seconds:
                    out.append((int(k), _floor_s(first_a), _floor_s(ts), int(run_len)))
                run_len, first_a = 0, 0.0
        state.update((run_len, first_a))
        if out:
            yield pd.DataFrame(out, columns=["key", "first_a_ts", "b_ts", "n_a"])

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, ONE_OR_MORE_SCHEMA, _ONE_OR_MORE_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


VALUE_SPIKE_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("prev_ts", LongType()),
        StructField("spike_ts", LongType()),
        StructField("prev_value", DoubleType()),
        StructField("spike_value", DoubleType()),
    ]
)
_VALUE_SPIKE_STATE = StructType(
    [StructField("last_ts", DoubleType()), StructField("last_value", DoubleType())]
)


def streaming_value_spike(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    factor: float = 2.0,
    max_gap_seconds: float = 3600.0,
    tiebreak_col: str | None = "event_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``pattern_value_spike`` — the IterativeCondition
    pair (next value ≥ factor × previous within gap) needs exactly ONE
    (ts, value) pair of state per key."""
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        last_ts, last_value = state.get if state.exists else (None, None)
        out: list[tuple[int, int, int, float, float]] = []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            vals = pdf[value_col].to_numpy().astype(float)
            for i in range(len(tss)):
                ts, v = float(tss[i]), float(vals[i])
                if (
                    last_ts is not None
                    and v >= factor * last_value
                    and ts - last_ts <= max_gap_seconds
                ):
                    out.append((int(k), _floor_s(last_ts), _floor_s(ts), last_value, v))
                last_ts, last_value = ts, v
        state.update((last_ts, last_value))
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "prev_ts", "spike_ts", "prev_value", "spike_value"],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, VALUE_SPIKE_SCHEMA, _VALUE_SPIKE_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


TRANSITION_SCHEMA = StructType(
    [
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)
_TRANSITION_STATE = StructType([StructField("last_type", StringType())])


def streaming_type_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming front half of ``event_type_transitions``: per-key
    (prev, next) transition events with ONE string of state per key
    (the previous event type).  Downstream, a plain streaming
    aggregation sums the counts — kept separate so the emitted
    transition stream composes with any sink/window."""
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_type,) = state.get if state.exists else (None,)
        pairs: dict[tuple[str, str], int] = {}
        for pdf in _group_chunks(pdfs, sort_cols):
            types = pdf[type_col].tolist()
            for t in types:
                if last_type is not None:
                    k2 = (last_type, t)
                    pairs[k2] = pairs.get(k2, 0) + 1
                last_type = t
        state.update((last_type,))
        if pairs:
            yield pd.DataFrame(
                [(a, b, n) for (a, b), n in pairs.items()],
                columns=["prev_type", "next_type", "n"],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, TRANSITION_SCHEMA, _TRANSITION_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


LAST_TOUCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_ts", LongType()),
        StructField("touch_type", StringType()),
        StructField("value", DoubleType()),
    ]
)
_LAST_TOUCH_STATE = StructType(
    [StructField("touch_ts", DoubleType()), StructField("touch_type", StringType())]
)


def streaming_last_touch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    purchase_type: str = "purchase",
    within_seconds: float = 604800.0,
    tiebreak_col: str | None = "event_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``last_touch_attribution``'s per-purchase front
    half: each purchase event emits (user, purchase_ts, touch_type,
    value) where touch_type is the most recent preceding non-purchase
    event's type if it is fresh (within *within_seconds*), else NULL —
    realtime attribution with exactly ONE (ts, type) pair of state per
    key.  Downstream a plain streaming aggregation sums per touch_type,
    exactly like the batch query's final groupBy."""
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        touch_ts, touch_type = state.get if state.exists else (None, None)
        out: list[tuple[int, int, str | None, float | None]] = []
        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            types = pdf[type_col].tolist()
            vals = pdf[value_col].to_numpy()
            for i in range(len(tss)):
                ts = float(tss[i])
                et = types[i]
                if et == purchase_type:
                    fresh = touch_ts is not None and ts - touch_ts <= within_seconds
                    v = vals[i]
                    out.append(
                        (
                            int(k),
                            _floor_s(ts),
                            touch_type if fresh else None,
                            None if pd.isna(v) else float(v),
                        )
                    )
                else:
                    touch_ts, touch_type = ts, et
        state.update((touch_ts, touch_type))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "purchase_ts", "touch_type", "value"]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, LAST_TOUCH_SCHEMA, _LAST_TOUCH_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )

"""Streaming twin of the declarative CEP compiler (operators/cep.py).

``match_pattern_stream`` compiles the SAME ``PatternStep`` spec —
contiguity / times / optional / negated — into ONE keyed NFA over
``applyInPandasWithState`` (Spark allows a single stateful operator
per streaming query, so the batch compiler's per-variant union becomes
per-variant chain lists inside one state store, exactly like
``streaming_pattern_sequence_optional``).

Semantics per expansion variant (shared `variant_specs`):

- positive chains advance greedily in (ts, tiebreak) order — identical
  to ``streaming_pattern_sequence`` (uniform contiguity required, the
  streaming NFA cannot commit to mixed per-gap lookahead);
- MID-GAP negation: while a chain waits between local steps li and
  li+1, an absent-event with ``ts > chain[li]`` records the earliest
  pending kill; when the chain advances at ``ts2`` it dies iff that
  kill ts ``< ts2`` (boundary-exclusive on both ends, matching the
  batch compiler's double-precision window — an absent sharing either
  endpoint's timestamp does not kill);
- TRAILING negation: a completed chain parks with deadline
  ``first_ts + within``; a later absent with ``ts > last_ts`` (and
  ``< deadline``) kills it, and survivors emit only once the WATERMARK
  passes the deadline (negation decided by time, like
  ``streaming_not_followed_by``), flushed by an event-time timer so
  quiet keys drain on watermark advance.  Without any trailing
  negation completions emit immediately and no timer is armed.

State per key is bounded: active chains by the step-1 arrival rate ×
within (pruned every event), parked completions by the completion rate
× within.  Ordering contract: order-correct within a micro-batch
(events sorted) and across batches on an ordered replay — the same
contract as the other pattern twins, verified against the batch
compiler on bounded replays (tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.cep import PatternStep, variant_specs
from .stateful import _epoch_s, _floor_s, _group_chunks, _tag

_CEP_STATE = StructType(
    [StructField("active", StringType()), StructField("done", StringType())]
)


def match_pattern_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list[PatternStep],
    within_seconds: float,
    tiebreak_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    if any(s.one_or_more for s in steps):
        from pyspark.sql import functions as F

        from ..operators.cep import _validate_loop
        from .stateful import streaming_one_or_more

        _validate_loop(steps)
        return streaming_one_or_more(
            events,
            key_col=key_col,
            ts_col=ts_col,
            a_pred=steps[0].pred,
            b_pred=steps[1].pred,
            within_seconds=within_seconds,
            tiebreak_col=tiebreak_col,
            watermark=watermark,
        ).select(
            F.col("key"),
            F.col("first_a_ts").cast("long").alias("step1_ts"),
            F.col("b_ts").cast("long").alias("step2_ts"),
            F.col("n_a").alias("step1_n"),
        )
    specs = variant_specs(steps)
    n_atoms = specs[0]["n_atoms"]
    pols = {c for spec in specs for _, c, _ in spec["atoms"][1:]}
    if len(pols) > 1:
        raise ValueError(
            "match_pattern_stream supports one uniform contiguity policy "
            f"(got {sorted(pols)}); use the batch compiler for mixed gaps"
        )
    strict = pols == {"strict"}

    # ---- tag predicate columns once per GLOBAL atom / negation gap ----
    # positives: __m<global atom idx>.  negations: __g<j> in spec order,
    # with each variant holding gap->[tag js] and trailing [tag js].
    tagged = events
    tagged_atoms: set[int] = set()
    neg_tags: list = []  # Column preds in tag order

    compiled = []  # per variant: dict(keep=[gi...], gaps={wait_len:[j]}, trail=[j])
    for spec in specs:
        keep = []
        for pred, _c, gi in spec["atoms"]:
            if gi not in tagged_atoms:
                tagged = tagged.withColumn(f"__m{gi}", _tag(pred))
                tagged_atoms.add(gi)
            keep.append(gi)
        gaps: dict[int, list[int]] = {}
        trail: list[int] = []
        for (li, ri), pred in spec["negs"].items():
            j = len(neg_tags)
            neg_tags.append(pred)
            tagged = tagged.withColumn(f"__g{j}", _tag(pred))
            if ri is None:
                trail.append(j)
            else:
                gaps.setdefault(li, []).append(j)
        compiled.append({"keep": keep, "gaps": gaps, "trail": trail})
    n_negs = len(neg_tags)
    any_trailing = any(v["trail"] for v in compiled)

    out_schema = StructType(
        [StructField("key", LongType())]
        + [StructField(f"step{i + 1}_ts", LongType()) for i in range(n_atoms)]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def _row(k: int, keep: list[int], chain: list[float]) -> tuple:
        row: list = [int(k)] + [None] * n_atoms
        # _floor_s, not int(): int() truncates toward zero, diverging
        # from the batch compiler's floor_long on pre-1970 sub-second
        # event times (int(-0.75) = 0 vs floor -1).
        for pos, gi in enumerate(keep):
            row[gi + 1] = _floor_s(chain[pos])
        return tuple(row)

    # state encodings ------------------------------------------------
    # active: per-variant "|"-joined; chains ";"-joined;
    #         chain = "t1,t2@kill" (kill empty when none pending)
    # done:   per-variant "|"-joined; entries ";"-joined; entry = "t1,t2"
    def _load(s: str | None, nv: int) -> list[list]:
        parts = s.split("|") if s else []
        if len(parts) != nv:
            parts = ["" for _ in range(nv)]
        return [p.split(";") if p else [] for p in parts]

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        active_s, done_s = state.get if state.exists else ("", "")
        nv = len(compiled)
        active: list[list[tuple[list[float], float | None]]] = []
        for p in _load(active_s, nv):
            chains = []
            for c in p:
                body, _, kill = c.partition("@")
                chains.append(
                    ([float(x) for x in body.split(",")], float(kill) if kill else None)
                )
            active.append(chains)
        done: list[list[list[float]]] = [
            [[float(x) for x in c.split(",")] for c in p] for p in _load(done_s, nv)
        ]
        out: list[tuple] = []

        for pdf in _group_chunks(pdfs, sort_cols):
            tss = _epoch_s(pdf[ts_col])
            m = {gi: pdf[f"__m{gi}"].to_numpy().astype(bool) for gi in tagged_atoms}
            g = [pdf[f"__g{j}"].to_numpy().astype(bool) for j in range(n_negs)]
            for i in range(len(tss)):
                ts = float(tss[i])
                for vi, v in enumerate(compiled):
                    keep, gaps, trail = v["keep"], v["gaps"], v["trail"]
                    n_pos = len(keep)
                    # 1. kill parked completions (trailing negation)
                    if trail and any(g[j][i] for j in trail):
                        done[vi] = [
                            c
                            for c in done[vi]
                            if not (c[-1] < ts < c[0] + within_seconds)
                        ]
                    # 2. advance / prune active chains
                    nxt: list[tuple[list[float], float | None]] = []
                    for chain, kill in active[vi]:
                        if ts - chain[0] >= within_seconds:
                            continue  # doomed: any completion is later
                        if m[keep[len(chain)]][i]:
                            if kill is not None and kill < ts:
                                continue  # mid-gap negation killed it
                            c2 = chain + [ts]
                            if len(c2) == n_pos:
                                if trail:
                                    done[vi].append(c2)
                                else:
                                    out.append(_row(k, keep, c2))
                            else:
                                nxt.append((c2, None))
                        elif strict:
                            continue  # advance-or-die
                        else:
                            k2 = kill
                            js = gaps.get(len(chain))
                            if js and any(g[j][i] for j in js) and ts > chain[-1]:
                                k2 = ts if k2 is None else min(k2, ts)
                            nxt.append((chain, k2))
                    active[vi] = nxt
                    # 3. start a new chain on a step-1 match
                    if m[keep[0]][i]:
                        if n_pos == 1:
                            if trail:
                                done[vi].append([ts])
                            else:
                                out.append(_row(k, keep, [ts]))
                        else:
                            active[vi].append(([ts], None))

        # 4. watermark flush of parked completions
        wm = state.getCurrentWatermarkMs() / 1000.0
        for vi, v in enumerate(compiled):
            if not v["trail"]:
                continue
            ready = [c for c in done[vi] if c[0] + within_seconds <= wm]
            done[vi] = [c for c in done[vi] if c[0] + within_seconds > wm]
            for c in sorted(ready):
                out.append(_row(k, v["keep"], c))

        has_active = any(active[vi] for vi in range(nv))
        has_done = any(done[vi] for vi in range(nv))
        if has_active or has_done:
            state.update(
                (
                    "|".join(
                        ";".join(
                            ",".join(repr(t) for t in chain)
                            + ("@" + repr(kill) if kill is not None else "")
                            for chain, kill in chains
                        )
                        for chains in active
                    ),
                    "|".join(
                        ";".join(",".join(repr(t) for t in c) for c in chains)
                        for chains in done
                    ),
                )
            )
            if any_trailing and has_done:
                deadline = min(
                    c[0] + within_seconds for vi in range(nv) for c in done[vi]
                )
                state.setTimeoutTimestamp(
                    max(int(deadline * 1000), int(wm * 1000) + 1)
                )
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["key"] + [f"step{j + 1}_ts" for j in range(n_atoms)]
            )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if any_trailing
        else GroupStateTimeout.NoTimeout
    )
    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, _CEP_STATE, "append", timeout)
    )

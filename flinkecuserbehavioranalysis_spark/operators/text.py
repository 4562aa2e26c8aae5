"""Text analysis operators (extension — training-data pipeline).

All pure Catalyst expressions (string/regex/array builtins) — zero
Python in the row path, so these run at scan speed and push column
pruning down to the parquet reader.  Shared SQL fragments keep the
DuckDB oracles byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
#: Plain alternation — identical semantics under Java regex and RE2.
BPE_TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

#: stopword set for quality scoring (tiny, deterministic)
STOPWORDS = ("the", "a", "of", "to", "and", "is", "in")

#: marker-token language-ID heuristic (n-gram profile degenerates to
#: marker lookup at this vocab size); same CASE text on both engines.
LANG_ID_CASE = (
    "CASE WHEN text LIKE '%the %' THEN 'en' "
    "WHEN text LIKE '%data %' THEN 'de' "
    "WHEN text LIKE '%la %' THEN 'es' "
    "ELSE 'unknown' END"
)


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token counts per doc."""
    return docs.select(
        F.col(id_col),
        # cast → long: Spark size() is INT, DuckDB len() is BIGINT
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens_ws"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_TOKEN_PATTERN}', 0)"))
        .cast("long")
        .alias("n_tokens_bpe"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / word-shape / stopword-ratio quality heuristics.

    Emits the raw signals plus a binary keep flag — downstream pipelines
    filter on ``quality = 'ok'``."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(
        F.expr(f"filter(split({text_col}, ' '), w -> w IN ({stop_arr}))")
    )
    avg_word_len = (n_chars - (n_words - F.lit(1))) / n_words
    stop_ratio = n_stop / n_words
    quality = (
        F.when(
            (n_words >= 5)
            & (n_words <= 1000)
            & (stop_ratio <= 0.5)
            & (avg_word_len >= 2.0)
            & (avg_word_len <= 12.0),
            F.lit("ok"),
        ).otherwise(F.lit("low"))
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-based language guess vs. the labeled ``lang`` column."""
    return docs.select(
        F.col(id_col),
        F.col("lang"),
        F.expr(LANG_ID_CASE).alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    md5.  The join key for cross-source exact dedup."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), " +", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def rolling_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Polynomial rolling hash over the token stream (Rabin-Karp style):
    acc = (acc*31 + h(token)) mod 1e9+7, h = first 32 md5 bits.

    Order-sensitive (unlike the bag-of-tokens SimHash) and computed as a
    single Catalyst ``aggregate`` fold — map-only, whole-stage codegen,
    no shuffle.  The modulus keeps every intermediate < 2^35 so ANSI
    overflow checking never trips."""
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    rolled = F.aggregate(
        F.split(F.col(text_col), " "),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + tok_hash(t)) % F.lit(1000000007),
    )
    return docs.select(F.col(id_col), rolled.alias("rolling_hash"))


def lang_id_ngram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    profile_size: int = 50,
) -> DataFrame:
    """Character-trigram language ID: build a top-*profile_size* trigram
    profile per labeled language (by document frequency), then guess
    each document's language as the profile with the largest trigram
    overlap (ties → lexicographically first language; no trigrams →
    'und').

    All relational — trigram explode (map-side), two shuffles to build
    the tiny profile table, one broadcast-join scoring pass over the
    corpus.  At 100 TB the profile builds on a hash_sample and the
    scoring join broadcasts n_langs × profile_size rows."""
    from pyspark.sql import Window

    trigram_expr = (
        f"CASE WHEN length({text_col}) >= 3 THEN "
        f"transform(sequence(1, length({text_col}) - 2), i -> substring({text_col}, i, 3)) "
        f"ELSE array() END"
    )
    tri = docs.select(
        F.col(id_col), F.col(lang_col), F.explode(F.expr(trigram_expr)).alias("tri")
    ).distinct()
    dfreq = tri.groupBy(lang_col, "tri").agg(F.count(F.lit(1)).alias("df"))
    wp = Window.partitionBy(lang_col).orderBy(F.col("df").desc(), F.col("tri").asc())
    profile = (
        dfreq.withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= profile_size)
        .select(F.col(lang_col).alias("cand_lang"), "tri")
    )
    overlap = (
        tri.select(id_col, "tri")
        .join(F.broadcast(profile), "tri")
        .groupBy(id_col, "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wb = Window.partitionBy(id_col).orderBy(F.col("hits").desc(), F.col("cand_lang").asc())
    best = (
        overlap.withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") == 1)
        .select(id_col, "cand_lang", "hits")
    )
    return (
        docs.select(id_col, lang_col)
        .join(best, id_col, "left_outer")
        .select(
            id_col,
            lang_col,
            F.coalesce(F.col("cand_lang"), F.lit("und")).alias("lang_guess_ngram"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("profile_hits"),
        )
    )

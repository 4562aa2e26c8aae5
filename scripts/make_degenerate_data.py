"""Degenerate-input tiers for robustness sweeps (round-5 hardening).

Real 100 TB corpora are never as clean as the driver's testdata: columns
carry NULLs, partitions come up empty, and a filter can hand any operator
a 3-row (or 0-row) input.  This script materializes six tiers OUTSIDE
the driver's directories:

- ``empty``  — every table with its exact schema and zero rows;
- ``tiny``   — three rows per table (forces k > n regimes: PQ codebooks,
  kmeans seeds, ntile buckets, drift halves);
- ``nulls``  — the source SF with NULLs injected into the value columns
  our Python/Arrow kernels and oracles both touch (events.event_type /
  value / props, documents.text / lang / source, embeddings.embedding /
  label) on a deterministic hash mask (~5-8%); keys stay intact;
- ``nulls2`` — NULLs in the TEMPORAL and KEY columns (events.ts /
  user_id, orders.o_orderdate / o_totalprice / o_orderpriority,
  lineitem measures + l_shipdate, customer.c_mktsegment) — the tier
  that exposes engine NULL-ordering divergence in windows/ranks,
  session/run-counter membership, and NULL-key join drops;
- ``specials`` — NaN / ±Inf / -0.0 in event measures and NaN / 1e308
  components inside embedding vectors — the corrupt-feature tier that
  exposes cast-overflow crashes and per-engine NaN ordering;
- ``times``  — extreme-but-valid timestamps (epoch 0, pre-1970 negative
  epochs with sub-second parts, the datetime64[ns] range edges
  1677/2262) and 1900/9999 date sentinels — the corrupt-clock tier that
  exposes floor-vs-truncate division divergence (see BENCH_DIFF.md);
- ``skew``   — pathological hot keys and byte-identical duplicate
  floods — the tier that exposes nondeterministic tie handling and
  quadratic near-dup blowups.

Run the full twin protocol against a tier with
``python scripts/verify.py --sf-dir <out>/nulls`` — round 5 closed at
184/184 on all eight tiers (BENCH_DIFF.md "degenerate-input sweep").

Usage:
  python scripts/make_degenerate_data.py [--src /root/testdata/sf0.01]
      [--out /tmp/spark_graft_degenerate]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# deterministic null masks — different moduli per column so the null sets
# overlap but do not coincide
NULL_PLANS = {
    "events": (
        "SELECT event_id, ts, user_id, "
        "CASE WHEN hash(event_id)%19=1 THEN NULL ELSE event_type END AS event_type, "
        "CASE WHEN hash(event_id)%17=0 THEN NULL ELSE value END AS value, "
        "CASE WHEN hash(event_id)%13=2 THEN NULL ELSE props END AS props "
        "FROM read_parquet('{src}/events.parquet')"
    ),
    "documents": (
        "SELECT doc_id, "
        "CASE WHEN hash(doc_id)%17=0 THEN NULL ELSE text END AS text, "
        "CASE WHEN hash(doc_id)%13=1 THEN NULL ELSE lang END AS lang, "
        "CASE WHEN hash(doc_id)%11=2 THEN NULL ELSE source END AS source, "
        "n_chars FROM read_parquet('{src}/documents.parquet')"
    ),
    "embeddings": (
        "SELECT vec_id, "
        "CASE WHEN hash(vec_id)%17=0 THEN NULL ELSE embedding END AS embedding, "
        "CASE WHEN hash(vec_id)%13=1 THEN NULL ELSE label END AS label "
        "FROM read_parquet('{src}/embeddings.parquet')"
    ),
}

# ~40% of docs get multibyte splices: CJK, astral-plane emoji (UTF-16
# surrogate pairs), combining accents, RTL — probes code-point vs
# byte/code-unit semantics in substring/length/trigram paths.  Round 5
# swept this tier clean on the first run (both engines are
# code-point-based; hashes run over UTF-8 bytes on both).
UNICODE_PLANS = {
    "documents": """
SELECT doc_id,
  CASE hash(doc_id)%10
    WHEN 0 THEN '\u6570\u636e \u5904\u7406 \u5f15\u64ce ' || text
    WHEN 1 THEN text || ' caf\u00e9 na\u00efve r\u00e9sum\u00e9'
    WHEN 2 THEN '\U0001F680\U0001F525 ' || text || ' \U0001F4CA'
    WHEN 3 THEN '\u0645\u0631\u062d\u0628\u0627 \u0628\u0627\u0644\u0639\u0627\u0644\u0645 ' || text
    ELSE text END AS text,
  lang, source, n_chars
FROM read_parquet('{src}/documents.parquet')""",
}

# NaN / ±Inf / -0.0 in ~5% of event measures and a NaN or 1e308
# component inside ~4% of embedding vectors — the corrupt-feature case
# every 100 TB ingest eventually sees.  Exposed 28 failures in round 5:
# quantization casts crashed (NaN -> INT overflows under ANSI),
# DECIMAL(28,12) moment sums overflowed on 1e308, and NaN reordered
# min/max/quantile outputs differently per engine.  Fixed by contract:
# vector operators exclude non-finite / insane (|x| > 1e6) components
# (_drop_null_vec, similarity.py) and measure-statistics kernels exclude
# non-finite measures (_finite, queries.py), both mirrored in the
# oracles.
SPECIAL_PLANS = {
    "events": """
SELECT event_id, ts, user_id, event_type,
  CASE hash(event_id)%83
    WHEN 0 THEN 'NaN'::DOUBLE
    WHEN 1 THEN 'Infinity'::DOUBLE
    WHEN 2 THEN '-Infinity'::DOUBLE
    WHEN 3 THEN -0.0
    ELSE value END AS value,
  props
FROM read_parquet('{src}/events.parquet')""",
    "embeddings": """
SELECT vec_id,
  CASE hash(vec_id)%53
    WHEN 0 THEN list_transform(embedding, (x, i) -> CASE WHEN i = 1 THEN 'NaN'::DOUBLE ELSE x END)
    WHEN 1 THEN list_transform(embedding, (x, i) -> CASE WHEN i = 2 THEN 1e308 ELSE x END)
    ELSE embedding END AS embedding,
  label
FROM read_parquet('{src}/embeddings.parquet')""",
}

# Extreme-but-valid timestamps in ~5% of events and classic dirty-data
# date sentinels in orders/lineitem: epoch 0, pre-1970 (NEGATIVE epoch —
# the floor-vs-truncate division trap: DuckDB's // floors, a naive Spark
# (cast/86400).cast(long) truncates toward zero), the TIMESTAMP(NANOS)
# int64 range edges (1677-09-21 / 2262-04-11, also pandas datetime64[ns]
# limits — the Arrow-kernel overflow probe), and 1900-01-01 / 9999-12-31
# order-date sentinels.
TIME_PLANS = {
    "events": """
SELECT event_id,
  CASE hash(event_id)%97
    WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'
    WHEN 1 THEN TIMESTAMP '1950-06-15 11:22:33.5'
    WHEN 2 THEN TIMESTAMP '1969-12-31 23:59:59.25'
    WHEN 3 THEN TIMESTAMP '1677-09-21 00:12:44'
    WHEN 4 THEN TIMESTAMP '2262-04-11 23:47:16'
    ELSE ts END AS ts,
  user_id, event_type, value, props
FROM read_parquet('{src}/events.parquet')""",
    "orders": """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
  CASE hash(o_orderkey)%67
    WHEN 0 THEN TIMESTAMP '1900-01-01 00:00:00'
    WHEN 1 THEN TIMESTAMP '9999-12-31 00:00:00'
    ELSE o_orderdate END AS o_orderdate,
  o_orderpriority
FROM read_parquet('{src}/orders.parquet')""",
    "lineitem": """
SELECT * REPLACE (
  CASE hash(l_orderkey*7+l_linenumber)%71
    WHEN 0 THEN TIMESTAMP '1900-01-01 00:00:00'
    WHEN 1 THEN TIMESTAMP '9999-12-31 00:00:00'
    ELSE l_shipdate END AS l_shipdate)
FROM read_parquet('{src}/lineitem.parquet')""",
}

# Pathological key skew + full-duplicate floods: one user owns ~40% of
# events (plus a 2,000-row flood of ONE byte-identical event row), one
# customer ~20% of orders, one supplier ~10% of lineitem, and ~10% of
# documents/embeddings are byte-identical copies of one row.  This is
# the hot-key / duplicate-heavy shape of real clickstreams, and it
# stresses exactly what uniform testdata never does: per-key window
# partitions holding half the table, LSH/near-dup buckets with
# quadratic pair blowup, k-NN TIES (identical vectors force
# deterministic tiebreak or hash mismatch), and AQE skew splits.
SKEW_PLANS = {
    "events": """
SELECT event_id, ts,
  CASE WHEN hash(event_id)%5<2
       THEN (SELECT min(user_id) FROM read_parquet('{src}/events.parquet'))
       ELSE user_id END AS user_id,
  event_type, value, props
FROM read_parquet('{src}/events.parquet')
UNION ALL
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props
FROM (SELECT * FROM read_parquet('{src}/events.parquet')
      ORDER BY event_id LIMIT 1) e, range(2000)""",
    "orders": """
SELECT o_orderkey,
  CASE WHEN hash(o_orderkey)%5=0
       THEN (SELECT min(o_custkey) FROM read_parquet('{src}/orders.parquet'))
       ELSE o_custkey END AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM read_parquet('{src}/orders.parquet')""",
    "lineitem": """
SELECT * REPLACE (
  CASE WHEN hash(l_orderkey*7+l_linenumber)%10=0
       THEN (SELECT min(l_suppkey) FROM read_parquet('{src}/lineitem.parquet'))
       ELSE l_suppkey END AS l_suppkey,
  CASE WHEN hash(l_orderkey*7+l_linenumber)%20=1
       THEN (SELECT min(l_partkey) FROM read_parquet('{src}/lineitem.parquet'))
       ELSE l_partkey END AS l_partkey)
FROM read_parquet('{src}/lineitem.parquet')""",
    "documents": """
SELECT doc_id,
  CASE WHEN hash(doc_id)%10=0
       THEN (SELECT text FROM read_parquet('{src}/documents.parquet')
             WHERE text IS NOT NULL ORDER BY doc_id LIMIT 1)
       ELSE text END AS text,
  lang, source, n_chars
FROM read_parquet('{src}/documents.parquet')""",
    "embeddings": """
SELECT vec_id,
  CASE WHEN hash(vec_id)%10=0
       THEN (SELECT embedding FROM read_parquet('{src}/embeddings.parquet')
             WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 1)
       ELSE embedding END AS embedding,
  label
FROM read_parquet('{src}/embeddings.parquet')""",
}

NULL2_PLANS = {
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "CASE WHEN hash(l_orderkey*7+l_linenumber)%23=0 THEN NULL ELSE l_quantity END AS l_quantity, "
        "CASE WHEN hash(l_orderkey*7+l_linenumber)%19=1 THEN NULL ELSE l_extendedprice END AS l_extendedprice, "
        "CASE WHEN hash(l_orderkey*7+l_linenumber)%17=2 THEN NULL ELSE l_discount END AS l_discount, "
        "l_tax, l_returnflag, l_linestatus, "
        "CASE WHEN hash(l_orderkey*7+l_linenumber)%29=3 THEN NULL ELSE l_shipdate END AS l_shipdate "
        "FROM read_parquet('{src}/lineitem.parquet')"
    ),
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, "
        "CASE WHEN hash(o_orderkey)%21=0 THEN NULL ELSE o_totalprice END AS o_totalprice, "
        "CASE WHEN hash(o_orderkey)%31=1 THEN NULL ELSE o_orderdate END AS o_orderdate, "
        "CASE WHEN hash(o_orderkey)%27=2 THEN NULL ELSE o_orderpriority END AS o_orderpriority "
        "FROM read_parquet('{src}/orders.parquet')"
    ),
    "events": (
        "SELECT event_id, "
        "CASE WHEN hash(event_id)%37=0 THEN NULL ELSE ts END AS ts, "
        "CASE WHEN hash(event_id)%41=1 THEN NULL ELSE user_id END AS user_id, "
        "event_type, value, props FROM read_parquet('{src}/events.parquet')"
    ),
    "customer": (
        "SELECT * REPLACE (CASE WHEN hash(c_custkey)%25=0 THEN NULL "
        "ELSE c_mktsegment END AS c_mktsegment) "
        "FROM read_parquet('{src}/customer.parquet')"
    ),
}


def build(src: str, out: str) -> None:
    con = duckdb.connect()
    tiers = {
        # ORDER BY ALL pins WHICH three rows the tiny tier draws —
        # DuckDB's bare LIMIT is not order-stable across scans, and an
        # unlucky draw (all rows in one md5 half) changes which
        # degenerate regimes the tier exercises between builds
        "empty": (None, " LIMIT 0"),
        "tiny": (None, " ORDER BY ALL LIMIT 3"),
        "nulls": (NULL_PLANS, ""),
        "nulls2": (NULL2_PLANS, ""),
        "unicode": (UNICODE_PLANS, ""),
        "specials": (SPECIAL_PLANS, ""),
        "times": (TIME_PLANS, ""),
        "skew": (SKEW_PLANS, ""),
    }
    for tier, (plans, lim) in tiers.items():
        d = os.path.join(out, tier)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            if plans and t in plans:
                q = plans[t].format(src=src)
            else:
                q = f"SELECT * FROM read_parquet('{src}/{t}.parquet'){lim}"
            con.execute(f"COPY ({q}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{tier}: {d}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/spark_graft_degenerate")
    args = ap.parse_args()
    build(args.src, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

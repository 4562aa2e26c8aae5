"""Degenerate-input tiers for robustness sweeps (round-5 hardening).

Real 100 TB corpora are never as clean as the driver's testdata: columns
carry NULLs, partitions come up empty, and a filter can hand any operator
a 3-row (or 0-row) input.  This script materializes three tiers OUTSIDE
the driver's directories:

- ``empty``  — every table with its exact schema and zero rows;
- ``tiny``   — three rows per table (forces k > n regimes: PQ codebooks,
  kmeans seeds, ntile buckets, drift halves);
- ``nulls``  — the source SF with NULLs injected into the value columns
  our Python/Arrow kernels and oracles both touch (events.event_type /
  value / props, documents.text / lang / source, embeddings.embedding /
  label) on a deterministic hash mask (~5-8%); keys stay intact.

Run the full twin protocol against a tier with
``python scripts/verify.py --sf-dir <out>/nulls`` — round 5 closed at
184/184 on all three tiers (BENCH_DIFF.md "degenerate-input sweep").

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


def build(src: str, out: str) -> None:
    con = duckdb.connect()
    for tier in ("empty", "tiny", "nulls"):
        d = os.path.join(out, tier)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            if tier == "nulls" and t in NULL_PLANS:
                q = NULL_PLANS[t].format(src=src)
            else:
                lim = {"empty": " LIMIT 0", "tiny": " LIMIT 3"}.get(tier, "")
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

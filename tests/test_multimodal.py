"""Multimodal plumbing unit tests — schema, Arrow batch shape, fan-out,
and extractor determinism (the pieces a real codec/encoder would slot
into; see operators/multimodal.py)."""

from __future__ import annotations

import hashlib

from flinkecuserbehavioranalysis_spark.operators.multimodal import (
    attach_binary,
    decode_meta,
    feature_extract,
    frame_sample,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a"), (3, "")], "doc_id long, text string"
    )


def test_decode_meta_is_deterministic_function_of_payload(spark):
    rows = {r.doc_id: r for r in decode_meta(attach_binary(_docs(spark))).collect()}
    assert rows[1].n_bytes == 11 and rows[1].width == 12 and rows[1].height == 78
    assert rows[3].n_bytes == 0  # empty payload still decodes
    assert all(r.channels == 3 for r in rows.values())


def test_frame_sample_fans_out_one_to_many(spark):
    got = frame_sample(attach_binary(_docs(spark)), max_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    # n_frames = n_bytes % 4 + 1
    assert len(by_doc[1]) == 11 % 4 + 1
    assert len(by_doc[2]) == 2
    assert len(by_doc[3]) == 1
    assert [r.frame_idx for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] == list(
        range(len(by_doc[1]))
    )


def test_feature_extract_matches_reference_hash_projection(spark):
    emb = {
        r.doc_id: r.embedding
        for r in feature_extract(attach_binary(_docs(spark)), dim=8).collect()
    }
    assert all(len(v) == 8 for v in emb.values())
    # component j = first-32-bits(md5(payload || '|' || j)) / 2^32
    expect0 = int(hashlib.md5(b"hello world|0").hexdigest()[:8], 16) / 2**32
    assert emb[1][0] == expect0
    assert all(0.0 <= x < 1.0 for v in emb.values() for x in v)
    # distinct payloads → distinct embeddings; same payload → identical
    assert emb[1] != emb[2]
    again = {
        r.doc_id: r.embedding
        for r in feature_extract(attach_binary(_docs(spark)), dim=8).collect()
    }
    assert again == emb

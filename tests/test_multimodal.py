"""Multimodal plumbing unit tests — schema, Arrow batch shape, fan-out,
and extractor determinism (the pieces a real codec/encoder would slot
into; see operators/multimodal.py)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from flinkecuserbehavioranalysis_spark.operators.multimodal import (
    attach_binary,
    attach_image_binary,
    decode_image,
    decode_meta,
    encode_bmp,
    encode_pgm,
    encode_png,
    feature_extract,
    frame_sample,
    real_decode_meta,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a"), (3, "")], "doc_id long, text string"
    )


@pytest.mark.soak
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


# ---------------------------------------------------------------------
# REAL decode (round 6): library-free encoders + header parsers
# ---------------------------------------------------------------------


def test_decode_image_round_trips_own_encoders():
    for enc, fmt, ch in [(encode_pgm, "pgm", 1), (encode_bmp, "bmp", 3), (encode_png, "png", 3)]:
        assert decode_image(enc(17, 9, b"hello world")) == (fmt, 17, 9, ch)
        assert decode_image(enc(1, 1, b"")) == (fmt, 1, 1, ch)  # empty fill


def test_encode_png_is_a_valid_png_file():
    """The PNG builder writes real chunk CRCs and a real zlib IDAT —
    byte-level validity, not just a parseable header."""
    b = encode_png(5, 4, b"xy")
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, verifying every CRC
    i, tags = 8, []
    while i < len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack_from(">I", b, i + 8 + ln)
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF, tag
        tags.append(tag)
        if tag == b"IDAT":
            raw = zlib.decompress(data)
            assert len(raw) == 4 * (1 + 5 * 3)  # filter byte + RGB row, 4 rows
            assert all(raw[r * 16] == 0 for r in range(4))  # filter type 0
        i += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def test_encode_bmp_rows_are_padded_to_four_bytes():
    b = encode_bmp(3, 2, b"z")  # 9-byte rows → 3 pad bytes each
    (off,) = struct.unpack_from("<I", b, 10)
    assert off == 54 and len(b) == 54 + 2 * 12


def test_decode_image_golden_fixtures_for_foreign_containers():
    """Hand-built bytes for the containers the encoders don't emit:
    ASCII PPM with comments, GIF, JPEG (APP0 segment walked to SOF0),
    top-down (negative-height) BMP."""
    ppm = b"P3\n# a comment\n 12  7\n255\n" + b"0 " * (12 * 7 * 3)
    assert decode_image(ppm) == ("ppm", 12, 7, 3)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert decode_image(gif) == ("gif", 320, 200, 3)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert decode_image(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9") == ("jpeg", 640, 480, 3)
    bmp = bytearray(encode_bmp(6, 3, b"z"))
    struct.pack_into("<i", bmp, 22, -3)  # top-down: abs(height)
    assert decode_image(bytes(bmp)) == ("bmp", 6, 3, 3)


def test_decode_image_rejects_corrupt_bytes():
    for bad in (b"", b"NOTANIMG", b"\xff\xd8\xff\xd9", b"P6\n12", b"P6\nx 3\n"):
        with pytest.raises(ValueError):
            decode_image(bad)


@pytest.mark.soak
def test_real_decode_meta_on_spark_matches_construction(spark):
    docs = spark.createDataFrame(
        [(0, "hello world", 11), (1, "a", 1), (2, "xyzw", 4), (3, None, None)],
        "doc_id long, text string, n_chars long",
    )
    rows = {r.doc_id: r for r in real_decode_meta(attach_image_binary(docs)).collect()}
    assert set(rows) == {0, 1, 2}  # NULL text excluded by contract
    for i, r in rows.items():
        n = {0: 11, 1: 1, 2: 4}[i]
        assert r.format == {0: "pgm", 1: "bmp", 2: "png"}[i % 3]
        assert (r.width, r.height) == (n % 64 + 1, n * 7 % 48 + 1)
        assert r.channels == (1 if r.format == "pgm" else 3)


def test_real_decode_meta_routes_corrupt_payloads_to_side_output(spark):
    df = spark.createDataFrame(
        [(1, bytearray(encode_pgm(2, 2, b"q"))), (2, bytearray(b"NOTANIMG")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in real_decode_meta(df).collect()}
    assert rows[1].format == "pgm" and rows[1].width == 2
    assert rows[2].format == "corrupt" and rows[2].width is None
    assert 3 not in rows  # NULL payload excluded, not 'corrupt'


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

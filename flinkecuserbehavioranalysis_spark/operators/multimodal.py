"""Multimodal column plumbing (extension — training-data pipeline).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested.  Since round 6 the DECODE is real
too, no external libraries needed: :func:`decode_image` is a header
parser for the self-describing raster formats (PNM P1–P6, BMP, PNG,
GIF, JPEG via an SOF marker walk), and :func:`encode_pgm` /
:func:`encode_bmp` / :func:`encode_png` build fully valid files from
raw bytes with stdlib ``struct``/``zlib`` only — so round-trips are
testable against golden fixtures and the registry query
``multimodal_real_decode_meta`` exercises real bytes end-to-end.
The original deterministic FAKE decoder remains the default of
``decode_meta`` (its oracle contract predates the real path); a heavier
codec (JPEG entropy decode, video demux) would still slot in behind an
import guard exactly where ``decode_image`` sits.

At 100 TB: binary payloads ride the columnar scan (parquet keeps them
out of unrelated queries via column pruning); the decode UDF receives
Arrow batches, so tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down when payloads are large to bound executor memory.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output schema of the decode stage
DECODE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for image bytes — deterministic fake)."""
    return docs.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


# --------------------------------------------------------------------
# Real decode: library-free header parsers + encoders
# --------------------------------------------------------------------

def _parse_pnm(b: bytes) -> tuple[str, int, int, int]:
    """PNM (P1..P6) header: magic, then whitespace/comment-separated
    width and height ('#' comments run to end of line)."""
    magic = b[:2].decode("ascii")
    channels = 3 if magic in ("P3", "P6") else 1
    fmt = {"1": "pbm", "2": "pgm", "3": "ppm", "4": "pbm", "5": "pgm", "6": "ppm"}[magic[1]]
    # tokenize past comments; we only need the first two ints (w, h)
    vals: list[int] = []
    i, n = 2, len(b)
    while i < n and len(vals) < 2:
        c = b[i : i + 1]
        if c == b"#":
            while i < n and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and b[j : j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            raise ValueError(f"corrupt PNM header byte {c!r} at offset {i}")
    if len(vals) < 2:
        raise ValueError("truncated PNM header")
    return fmt, vals[0], vals[1], channels


def decode_image(payload: bytes) -> tuple[str, int, int, int]:
    """Parse REAL image bytes → (format, width, height, channels) with
    no external library: every self-describing raster container
    declares its geometry in the header.

    - PNM ``P1``–``P6`` (ASCII + binary PBM/PGM/PPM, comment-aware)
    - BMP (BITMAPINFOHEADER; negative biHeight = top-down → abs)
    - PNG (IHDR width/height/color-type; no inflate needed for meta)
    - GIF87a/GIF89a (logical screen descriptor)
    - JPEG (marker walk to the first SOF0/1/2 frame header — skips
      APPn/quantization/Huffman segments by their declared lengths)

    Raises ``ValueError`` on unrecognized or truncated bytes — corrupt
    payloads are DATA, not crashes, so callers route them to an error
    side-output instead of failing the stage."""
    b = bytes(payload)
    if len(b) >= 10 and b[:1] == b"P" and b[1:2] in b"123456":
        return _parse_pnm(b)
    if b[:2] == b"BM" and len(b) >= 30:
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        return "bmp", w, abs(h), (1 if bpp <= 8 else bpp // 8)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26:
        w, h = struct.unpack_from(">II", b, 16)
        color_type = b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"corrupt PNG color type {color_type}")
        return "png", w, h, channels
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        return "gif", w, h, 3
    if b[:2] == b"\xff\xd8":  # JPEG SOI: walk segments to an SOF marker
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                raise ValueError(f"corrupt JPEG marker at offset {i}")
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if i + 10 > len(b):
                    break
                h, w = struct.unpack_from(">HH", b, i + 5)
                return "jpeg", w, h, b[i + 9]
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before SOF
                break
            seg_len = struct.unpack_from(">H", b, i + 2)[0]
            i += 2 + seg_len
        raise ValueError("JPEG without an SOF frame header")
    raise ValueError(f"unrecognized image container (head={b[:8]!r})")


def _raster(fill: bytes, n: int) -> bytes:
    """Tile *fill* to exactly *n* bytes (deterministic pixel content)."""
    if n <= 0:
        return b""
    if not fill:
        fill = b"\x00"
    return (fill * (n // len(fill) + 1))[:n]


def encode_pgm(width: int, height: int, fill: bytes) -> bytes:
    """Valid binary PGM (P5, 8-bit grayscale): header + w*h raster."""
    return b"P5\n%d %d\n255\n" % (width, height) + _raster(fill, width * height)


def encode_bmp(width: int, height: int, fill: bytes) -> bytes:
    """Valid 24-bit BMP (BITMAPINFOHEADER, bottom-up, 4-byte row pad)."""
    row = width * 3
    pad = (-row) % 4
    body = b"".join(
        _raster(fill[i % max(len(fill), 1) :] + fill, row) + b"\x00" * pad
        for i in range(height)
    )
    size = 54 + len(body)
    return (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, fill: bytes) -> bytes:
    """Valid RGB PNG: IHDR + zlib-deflated filter-0 scanlines + IEND —
    stdlib only, CRCs included, loadable by any real viewer."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    row = width * 3
    raw = b"".join(b"\x00" + _raster(fill[i % max(len(fill), 1) :] + fill, row) for i in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


REAL_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def attach_image_binary(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize a REAL image payload per document: doc_id picks the
    container (id%3 → PGM / BMP / PNG), geometry derives from n_chars
    (width = pmod(n_chars,64)+1, height = pmod(n_chars*7,48)+1), pixels
    tile the document's UTF-8 bytes.  Every payload is a fully valid
    file (PNG includes CRCs + zlib IDAT), so this column stands in for
    a crawled image corpus while staying oracle-derivable.  Map-only;
    rows with NULL text/n_chars carry nothing to encode and are
    excluded by contract (the oracle's ``text IS NOT NULL`` guard)."""
    src = docs.where(F.col("text").isNotNull() & F.col("n_chars").isNotNull()).select(
        F.col(id_col).cast("long").alias(id_col),
        F.col("text"),
        F.pmod(F.col("n_chars"), F.lit(64)).cast("int").alias("__w0"),
        F.pmod(F.col("n_chars") * 7, F.lit(48)).cast("int").alias("__h0"),
    )
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("payload", BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoders = (encode_pgm, encode_bmp, encode_png)
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = [
                encoders[int(i) % 3](int(w) + 1, int(h) + 1, t.encode("utf-8"))
                for i, w, h, t in zip(ids, pdf["__w0"], pdf["__h0"], pdf["text"])
            ]
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return src.mapInPandas(batches, out_schema)


def real_decode_meta(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL decode: parse each binary payload's container
    header → (format, width, height, channels) via :func:`decode_image`.
    Partition-parallel map stage, no shuffle; corrupt payloads become
    format='corrupt' rows with NULL geometry (an error side-output a
    caller can split off) rather than task failures — at corpus scale a
    bad file must never kill the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts, ws, hs, cs = [], [], [], []
            for p in pdf["payload"]:
                try:
                    fmt, w, h, c = decode_image(p)
                    fmts.append(fmt); ws.append(w); hs.append(h); cs.append(c)
                except ValueError:
                    fmts.append("corrupt"); ws.append(None); hs.append(None); cs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                }
            )

    return with_payload.where(F.col("payload").isNotNull()).mapInPandas(
        batches, REAL_DECODE_SCHEMA
    )


def _fake_decode(n_bytes: pd.Series) -> pd.DataFrame:
    # deterministic fake decode: metadata as pure functions of payload size
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "width": (n_bytes % 640 + 1).astype("int32"),
            "height": ((n_bytes * 7) % 480 + 1).astype("int32"),
            "channels": pd.Series([3] * len(n_bytes), dtype="int32"),
        }
    )


def decode_meta(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched "decode": binary payload → typed metadata via
    ``mapInPandas`` (the real decoder would slot into ``_fake_decode``).
    Partition-parallel, no shuffle — decode is a map stage."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            out = _fake_decode(n_bytes)
            out.insert(0, "doc_id", pdf[id_col].astype("int64"))
            yield out

    # NULL payloads carry nothing to decode — excluded by contract
    # (matches the oracles' `text IS NOT NULL` guard).
    return with_payload.where(F.col("payload").isNotNull()).mapInPandas(decode_batches, DECODE_META_SCHEMA)


RESIZE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("scale_num", IntegerType()),
    ]
)


def resize_meta(with_payload: DataFrame, max_side: int = 256, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched "resize" stage: aspect-preserving fit into a
    *max_side* box.  The geometry math is real (integer scale applied to
    the fake-decoded dimensions); the pixel resample is where a real
    library call slots in.  Map-only — composes after ``decode_meta``'s
    stage without any shuffle between them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len)
            meta = _fake_decode(n_bytes)
            side = meta[["width", "height"]].max(axis=1)
            # fixed-point (1e6) scale so the fake stays integer-deterministic
            scale = (max_side * 1_000_000 // side).clip(upper=1_000_000).astype("int64")
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": meta["width"],
                    "height": meta["height"],
                    "out_width": (meta["width"] * scale // 1_000_000).astype("int32"),
                    "out_height": (meta["height"] * scale // 1_000_000).astype("int32"),
                    "scale_num": scale.astype("int32"),
                }
            )
            yield out

    # NULL payloads carry nothing to decode — excluded by contract
    # (matches the oracles' `text IS NOT NULL` guard).
    return with_payload.where(F.col("payload").isNotNull()).mapInPandas(batches, RESIZE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def frame_sample(with_payload: DataFrame, max_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched "frame sampling": one input row fans out to N frame
    rows (the one-to-many mapInPandas shape a video pipeline needs).
    Frame count/offsets are deterministic functions of payload size
    (n_frames = n_bytes mod max_frames + 1, evenly spaced offsets); a
    real demuxer call replaces the arithmetic, not the plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64").to_numpy()
            sizes = pdf["payload"].map(len).astype("int64").to_numpy()
            # the whole fan-out is np.repeat arithmetic — no Python row loop
            n_frames = sizes % max_frames + 1
            size_rep = np.repeat(sizes, n_frames)
            nf_rep = np.repeat(n_frames, n_frames)
            starts = np.cumsum(n_frames) - n_frames
            idx = np.arange(int(n_frames.sum()), dtype="int64") - np.repeat(starts, n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, n_frames),
                    "frame_idx": idx.astype("int32"),
                    "frame_offset": size_rep * idx // nf_rep,
                    "frame_bytes": size_rep // nf_rep,
                }
            )

    # NULL payloads carry nothing to decode — excluded by contract
    # (matches the oracles' `text IS NOT NULL` guard).
    return with_payload.where(F.col("payload").isNotNull()).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


FEATURE_SCHEMA_DDL = "doc_id long, embedding array<double>"


def feature_extract(
    with_payload: DataFrame, dim: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched "feature extraction": binary payload → fixed-*dim*
    embedding (``array<double>``) — the model-inference stage of a
    multimodal pipeline (CLIP/CLAP-style encoders slot into the batch
    loop; batching is exactly what a GPU encoder wants).

    The stand-in extractor is a deterministic md5 hash-projection:
    component j = first-32-bits(md5(payload_utf8 || '|' || j)) / 2^32 —
    engine-portable, so unlike a real model this fake is fully
    oracle-checkable (the DuckDB twin computes identical doubles).
    Map-only; no shuffle."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = [
                [
                    int(
                        hashlib.md5(bytes(p) + b"|" + str(j).encode()).hexdigest()[:8], 16
                    )
                    / 4294967296.0
                    for j in range(dim)
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": embs}
            )

    # NULL payloads carry nothing to decode — excluded by contract
    # (matches the oracles' `text IS NOT NULL` guard).
    return with_payload.where(F.col("payload").isNotNull()).mapInPandas(batches, FEATURE_SCHEMA_DDL)

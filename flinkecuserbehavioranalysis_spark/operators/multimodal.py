"""Multimodal column plumbing (extension — training-data pipeline).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side machinery here is real and tested — schema, Arrow batch
shape, ``mapInPandas`` partition flow — while the actual media decode is
STUBBED (no image/audio libs in this container): ``decode_meta`` runs a
deterministic fake decoder, and ``decode_image`` raises
``NotImplementedError`` where a real pillow/ffmpeg call would go.

At 100 TB: binary payloads ride the columnar scan (parquet keeps them
out of unrelated queries via column pruning); the decode UDF receives
Arrow batches, so tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
down when payloads are large to bound executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
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


def decode_image(payload: bytes) -> tuple[int, int, int]:  # pragma: no cover - stub
    """Real decoder hook.  STUB: image libraries are not available in
    this environment; swap in PIL/libvips here in production."""
    raise NotImplementedError("media decode requires an image library; use decode_meta's fake")


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

"""Python UDTFs (SURVEY.md §2.10 — the Spark 4 user-defined TABLE
function surface, the flatMap/UDTF analog of Flink's TableFunction).

``ChunkDocument`` re-expresses ``sampling.chunk_documents``'s chunking
as a UDTF so the two surfaces are cross-checked by one test: identical
(idx, start, len, text) rows.  The Catalyst generator version remains
the hot path (JVM-side substring, no Python transfer) — a UDTF earns
its per-row Python cost only when chunk boundaries need real logic
(sentence segmentation, tokenizer-aware splits) that expressions can't
say.  Register per session::

    from pyspark.sql.functions import udtf
    chunk_udtf = udtf(ChunkDocument, returnType=CHUNK_SCHEMA_DDL)
"""

from __future__ import annotations

CHUNK_SCHEMA_DDL = "chunk_idx bigint, chunk_start bigint, chunk_len bigint, chunk_text string"


class ChunkDocument:
    """Yield overlapping character chunks of *text* — same contract as
    ``chunk_documents``: stride = chunk − overlap, 1-based starts,
    max(1, ceil((len − overlap) / stride)) chunks, final chunk clipped
    at the document end."""

    def eval(self, text: str, chunk_chars: int = 200, overlap: int = 50):
        if text is None:
            return
        if overlap >= chunk_chars:
            raise ValueError("overlap must be < chunk_chars")
        stride = chunk_chars - overlap
        n = max(1, -(-(len(text) - overlap) // stride))
        for i in range(n):
            start = i * stride
            piece = text[start : start + chunk_chars]
            yield i, start + 1, len(piece), piece

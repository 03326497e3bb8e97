"""Document chunking — the Spark mapping of the reference's
RecursiveCharacterTextSplitter(chunk_size=500, chunk_overlap=50) +
offset recovery (reference preprocessing.py:300-305, :473-489; SURVEY.md
P1/P2/W3).

Deliberate divergence (SURVEY.md §7.3 spirit): the reference's splitter
is separator-recursive with heuristics that depend on a third-party
implementation; we pin a deterministic fixed-stride character window
(stride = chunk_size - overlap) with exact (start_char, end_char)
offsets, so the oracle is expressible in ANSI SQL and the operator is a
pure JVM-side expression (sequence → transform → posexplode) — no Python
in the hot path, no O(n) `text.find` offset recovery (the reference's P2
re-scans the document per chunk).

Chunks become the indexing unit exactly as in the reference: chunk_id is
dense per doc (0-based), the global (doc_id, chunk_id) key replaces the
reference's corpus-wide monotonically extended chunk-id space
(retriever.py:268-310), which our deterministic ids make unnecessary.
"""

from __future__ import annotations

DEFAULT_CHUNK_SIZE = 500
DEFAULT_OVERLAP = 50


def chunk_docs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
):
    """(doc_id, chunk_id, start_char, end_char, chunk_text).

    n_chunks = ceil((len - overlap) / stride) for len > 0 (so the final
    window may be short but never empty); empty docs yield zero chunks.
    start_char is 0-based inclusive, end_char exclusive — substr
    semantics shared with the SQL oracle.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    from pyspark.sql import functions as F

    stride = chunk_size - overlap
    length = F.length(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((length - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    idxs = F.when(length > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.posexplode(idxs).alias("chunk_id", "_i"),
    )
    start = F.col("chunk_id").cast("long") * stride
    return exploded.select(
        "doc_id",
        "chunk_id",
        start.alias("start_char"),
        F.least(start + chunk_size, F.length("_text").cast("long")).alias("end_char"),
        F.substring(F.col("_text"), (start + 1).cast("int"), chunk_size).alias(
            "chunk_text"
        ),
    )

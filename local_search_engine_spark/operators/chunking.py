"""Document chunking — the Spark mapping of the reference's
RecursiveCharacterTextSplitter(chunk_size=500, chunk_overlap=50) +
offset recovery (reference preprocessing.py:300-305, :473-489; SURVEY.md
P1/P2/W3).

Two modes:

  * chunk_docs (default): deterministic fixed-stride character window
    (stride = chunk_size - overlap) with exact (start_char, end_char)
    offsets — the oracle is expressible in ANSI SQL and the operator is
    a pure JVM-side expression (sequence → transform → posexplode), no
    Python in the hot path, no O(n) `text.find` offset recovery (the
    reference's P2 re-scans the document per chunk).
  * chunk_docs_separators (compat mode): the reference splitter's
    separator-recursive semantics (["\\n\\n", "\\n", " ", ""] hierarchy,
    size budget, overlap carryover) re-specified deterministically with
    exact offsets, as an Arrow mapInPandas — prose-respecting boundaries
    when a user needs them; rows-only driver gate (greedy packing is
    stateful per doc, not a SQL-expressible shape), pinned by tests.

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


DEFAULT_SEPARATORS = ("\n\n", "\n", " ", "")  # reference preprocessing.py:304


def split_units(
    text: str, chunk_size: int, separators=DEFAULT_SEPARATORS, base: int = 0
) -> list[tuple[int, int]]:
    """Recursive separator split into units of ≤ chunk_size chars, as
    (start, end) offset pairs whose concatenation IS the text (separators
    stay attached to the end of the preceding unit — no characters are
    dropped, unlike the third-party splitter's whitespace stripping, so
    offsets are exact by construction rather than recovered with the
    reference's O(n) text.find per chunk, preprocessing.py:473-489)."""
    n = len(text)
    if n == 0:
        return []
    if n <= chunk_size:
        return [(base, base + n)]
    sep = separators[0]
    if sep == "":
        return [
            (base + k, base + min(k + chunk_size, n))
            for k in range(0, n, chunk_size)
        ]
    units: list[tuple[int, int]] = []
    pos = 0
    while pos < n:
        hit = text.find(sep, pos)
        end = n if hit == -1 else hit + len(sep)
        piece = text[pos:end]
        if len(piece) <= chunk_size:
            units.append((base + pos, base + end))
        else:
            units.extend(
                split_units(piece, chunk_size, separators[1:], base + pos)
            )
        pos = end
    return units


def pack_units(
    units: list[tuple[int, int]], chunk_size: int, overlap: int
) -> list[tuple[int, int]]:
    """Greedy packing of contiguous units into chunk windows of
    ≤ chunk_size chars, with an overlap carryover of whole trailing units
    totalling ≤ overlap chars (dropped entirely when carry + next unit
    would overflow — the splitter's pop-from-front rule). Returns chunk
    (start, end) windows; every unit is covered by ≥1 chunk."""
    chunks: list[tuple[int, int]] = []
    cur: list[tuple[int, int]] = []
    cur_len = 0
    for u in units:
        ulen = u[1] - u[0]
        if cur and cur_len + ulen > chunk_size:
            chunks.append((cur[0][0], cur[-1][1]))
            # trailing-unit overlap carryover
            carry: list[tuple[int, int]] = []
            clen = 0
            for v in reversed(cur):
                vlen = v[1] - v[0]
                if clen + vlen > overlap:
                    break
                carry.insert(0, v)
                clen += vlen
            if clen + ulen > chunk_size:
                carry, clen = [], 0
            cur, cur_len = carry, clen
        cur.append(u)
        cur_len += ulen
    if cur:
        chunks.append((cur[0][0], cur[-1][1]))
    return chunks


def chunk_spans(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separators=DEFAULT_SEPARATORS,
) -> list[tuple[int, int]]:
    """Pure-Python separator-aware chunker (the single implementation the
    Spark operator ships to workers — test it directly)."""
    return pack_units(split_units(text, chunk_size, separators), chunk_size, overlap)


def chunk_docs_separators(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separators=DEFAULT_SEPARATORS,
):
    """Separator-aware COMPAT MODE of chunk_docs — the reference's
    recursive splitter semantics (separator hierarchy ["\\n\\n", "\\n",
    " ", ""], size budget, overlap carryover; reference
    preprocessing.py:300-305) with exact offsets. Boundary behavior is a
    documented re-specification, not a bit-replica of the third-party
    splitter (which strips whitespace and so cannot report exact
    offsets). Arrow-batched mapInPandas — row-local string work, no
    shuffle, embarrassingly parallel at 100 TB. Greedy packing is
    stateful per document, hence not expressible as a SQL oracle: the
    driver gate for this operator is rows-only; exactness is pinned by
    tests/test_chunking.py against the pure-Python chunk_spans."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_id": [],
                "start_char": [],
                "end_char": [],
                "chunk_text": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                for cid, (s, e) in enumerate(
                    chunk_spans(text, chunk_size, overlap, separators)
                ):
                    out["doc_id"].append(did)
                    out["chunk_id"].append(cid)
                    out["start_char"].append(s)
                    out["end_char"].append(e)
                    out["chunk_text"].append(text[s:e])
            yield pd.DataFrame(out)

    from ..plans.layout import widen_for_kernel

    return widen_for_kernel(docs.select(id_col, text_col)).mapInPandas(
        gen,
        "doc_id long, chunk_id int, start_char long, end_char long, chunk_text string",
    )

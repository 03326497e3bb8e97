"""Chunking operator (SURVEY.md P1/P2/W3): offsets, reconstruction,
edge cases — engine vs pure-Python expectations."""

import pyspark.sql.functions as F
import pytest

from local_search_engine_spark.operators.chunking import chunk_docs


def py_chunks(text: str, size: int, overlap: int):
    stride = size - overlap
    if len(text) == 0:
        return []
    import math

    n = max(1, math.ceil((len(text) - overlap) / stride))
    out = []
    for i in range(n):
        s = i * stride
        out.append((i, s, min(s + size, len(text)), text[s : s + size]))
    return out


CASES = [
    "",
    "x",
    "a" * 49,
    "b" * 50,
    "c" * 51,
    "word " * 123,
    "line\n" * 77 + "tail",
    "μnicode ünïcode " * 20,
]


@pytest.fixture(scope="module")
def chunked(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    rows = chunk_docs(docs, "text", "doc_id", chunk_size=50, overlap=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_char, r.end_char, r.chunk_text)
        )
    return {k: sorted(v) for k, v in by_doc.items()}


def test_matches_python_model(chunked):
    for i, text in enumerate(CASES):
        assert chunked.get(i, []) == py_chunks(text, 50, 10), f"doc {i}"


def test_empty_doc_zero_chunks(chunked):
    assert 0 not in chunked


def test_reconstruction(chunked):
    """Dropping each chunk's leading `overlap` chars (except the first)
    and concatenating reproduces the document."""
    for i, text in enumerate(CASES):
        if not text:
            continue
        parts = [c[3] if c[0] == 0 else c[3][10:] for c in chunked[i]]
        assert "".join(parts) == text, f"doc {i}"


def test_offsets_consistent(chunked):
    for i, text in enumerate(CASES):
        for cid, s, e, ctext in chunked.get(i, []):
            assert text[s:e] == ctext
            assert e - s == len(ctext)


def test_overlap_ge_size_rejected(spark):
    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_docs(docs, chunk_size=10, overlap=10)


SEP_CASES = CASES + [
    "para one.\n\npara two is rather longer than the first paragraph.\n\n"
    + ("sentence with several words. " * 30)
    + "\n\nfinal para.",
    "no separators at all " + "y" * 300,
    "\n\n\n\nleading and trailing\n\n\n\n",
    "a b c " * 200,  # only space-level splits
    "z" * 777,  # forces the ""-level char split
]


def test_separator_chunks_invariants(spark):
    """Compat-mode splitter: unit/packing invariants on every case —
    size budget respected, offsets exact, full coverage, separator
    boundaries preferred over mid-word cuts."""
    from local_search_engine_spark.operators.chunking import (
        chunk_docs_separators,
        chunk_spans,
        split_units,
    )

    size, overlap = 50, 10
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SEP_CASES)], "doc_id long, text string"
    )
    rows = chunk_docs_separators(
        docs, "text", "doc_id", chunk_size=size, overlap=overlap
    ).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_char, r.end_char, r.chunk_text)
        )
    for i, text in enumerate(SEP_CASES):
        got = sorted(by_doc.get(i, []))
        # Spark op == the pure-Python single implementation
        want = [
            (cid, s, e, text[s:e])
            for cid, (s, e) in enumerate(chunk_spans(text, size, overlap))
        ]
        assert got == want, f"doc {i}"
        # units reconstruct the text exactly (no dropped characters)
        units = split_units(text, size)
        assert "".join(text[s:e] for s, e in units) == text
        assert all(e - s <= size for s, e in units)
        for cid, s, e, ctext in got:
            assert text[s:e] == ctext
            assert e - s <= size
        # coverage: every character of the doc appears in some chunk
        if text:
            covered = set()
            for _, s, e, _ in got:
                covered.update(range(s, e))
            assert covered == set(range(len(text))), f"doc {i}"


def test_separator_chunks_prefer_boundaries():
    """On prose, chunk edges land after separators, not mid-word."""
    from local_search_engine_spark.operators.chunking import chunk_spans

    text = ("alpha beta gamma delta. " * 40).strip()
    spans = chunk_spans(text, 50, 10)
    for s, e in spans[:-1]:
        assert text[e - 1] == " ", (s, e, text[max(0, e - 5) : e + 5])


def test_chunks_indexable(spark):
    """Chunks can be fed back through the index build as the indexing
    unit (the reference's ProcessedChunk pipeline shape)."""
    from local_search_engine_spark.operators.build import build_index_from
    from local_search_engine_spark.operators.query import topk

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    ch = chunk_docs(docs, "text", "doc_id", chunk_size=50, overlap=10)
    units = ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text"),
    )
    idx = build_index_from(units, text_col="chunk_text", cache=False)
    hits = topk(idx, "word", 5).collect()
    assert len(hits) > 0
    assert all(h.doc_id // 1000 == 5 for h in hits)  # "word " doc is case 5

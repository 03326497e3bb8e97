"""Degenerate-corpus edges: the engine must not crash or divide by zero
on empty corpora, single documents, or token-less documents (SURVEY.md
§7.5 risk 4 — tiny corpora legitimately produce negative epsilon floors)."""

from local_search_engine_spark.operators.build import build_index_from
from local_search_engine_spark.operators.postings import build_postings
from local_search_engine_spark.operators.query import topk

SCHEMA = "doc_id long, text string"


def test_empty_corpus(spark):
    idx = build_index_from(
        spark.createDataFrame([], SCHEMA), text_col="text", cache=False
    )
    assert idx.n_docs == 0
    assert idx.avgdl == 0.0
    assert idx.tf.count() == 0
    assert topk(idx, "anything", 5).collect() == []


def test_single_doc(spark):
    docs = spark.createDataFrame([(0, "alpha beta alpha")], SCHEMA)
    idx = build_index_from(docs, text_col="text", cache=False)
    assert idx.n_docs == 1
    assert idx.avgdl == 3.0
    # df == n_docs for every term -> raw idf = ln(0.5/1.5) < 0 -> floored
    # to eps * avg_idf (negative on this corpus) — scores still rankable
    hits = topk(idx, "alpha", 5).collect()
    assert [h.doc_id for h in hits] == [0]


def test_tokenless_docs_counted_in_stats(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "!!! ???"), (2, "")], SCHEMA
    )
    idx = build_index_from(docs, text_col="text", cache=False)
    assert idx.n_docs == 3
    assert abs(idx.avgdl - 2 / 3) < 1e-12  # token-less docs pull avgdl down
    lens = {r.doc_id: r.doc_len for r in idx.docs.collect()}
    assert lens == {0: 2, 1: 0, 2: 0}
    hits = topk(idx, "alpha", 5).collect()
    assert [h.doc_id for h in hits] == [0]


def test_postings_on_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} shared") for i in range(5)], SCHEMA
    )
    idx = build_index_from(docs, text_col="text", cache=False)
    postings, meta = build_postings(idx, docs_per_shard=2, block_span=2, n_buckets=4)
    assert postings.count() > 0
    parts = {r.part_id for r in meta.collect()}
    assert parts == {0, 1, 2}  # 5 docs / 2 per shard


def test_all_duplicate_content(spark):
    """Every doc identical: every term has df == n_docs, avg_idf < 0,
    all scores equal -> ranks resolve by doc_id ascending (pinned)."""
    docs = spark.createDataFrame([(i, "same text here") for i in range(4)], SCHEMA)
    idx = build_index_from(docs, text_col="text", cache=False)
    hits = topk(idx, "same text", 10).collect()
    assert [h.doc_id for h in hits] == [0, 1, 2, 3]
    assert len({round(h.score, 12) for h in hits}) == 1

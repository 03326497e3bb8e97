"""Structured Streaming ingest (streaming/merge.py): new corpus files
landing in a watched directory merge into the index via foreachBatch,
and the merged index equals a from-scratch build over the union —
the streaming re-expression of the reference's incremental add
(reference retriever.py:268-310)."""

import os

import pytest

from local_search_engine_spark.operators.build import build_index_from
from local_search_engine_spark.streaming.merge import stream_ingest

SCHEMA = "doc_id long, text string"


def mkdocs(spark, lo, hi):
    rows = [(i, f"stream doc {i} shard merge " + "token " * (i % 5 + 1)) for i in range(lo, hi)]
    return spark.createDataFrame(rows, SCHEMA)


def test_stream_merge_equals_rebuild(spark, tmp_path):
    watch = str(tmp_path / "incoming")
    os.makedirs(watch, exist_ok=True)
    ckpt = str(tmp_path / "ckpt")

    base = build_index_from(mkdocs(spark, 0, 40), text_col="text", cache=False)
    state = {"index": base}

    # two file drops = two micro-batches under availableNow
    mkdocs(spark, 40, 70).write.mode("append").parquet(watch)
    mkdocs(spark, 70, 100).write.mode("append").parquet(watch)

    q = stream_ingest(
        spark, watch, state, SCHEMA, text_col="text", checkpoint_dir=ckpt
    )
    q.awaitTermination(120)

    merged = state["index"]
    full = build_index_from(mkdocs(spark, 0, 100), text_col="text", cache=False)

    assert merged.n_docs == full.n_docs == 100
    assert abs(merged.avgdl - full.avgdl) < 1e-9
    got = {
        (r.term): (r.df, round(r.idf, 12))
        for r in merged.idf.select("term", "df", "idf").collect()
    }
    want = {
        (r.term): (r.df, round(r.idf, 12))
        for r in full.idf.select("term", "df", "idf").collect()
    }
    assert got == want

    # restart with the same checkpoint: no files left -> no double merge
    state2 = {"index": merged}
    q2 = stream_ingest(spark, watch, state2, SCHEMA, text_col="text", checkpoint_dir=ckpt)
    q2.awaitTermination(60)
    assert state2["index"].n_docs == 100

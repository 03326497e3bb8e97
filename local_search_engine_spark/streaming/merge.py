"""Incremental index maintenance: the reference's corpus append
(reference retriever.py:268-310, ui.py:214-225 — extend the in-memory
corpus dict and chunk-id space) re-expressed as batch index-merge
algebra, plus a Structured Streaming ingest wrapper.

The index state that must merge is exactly three associative pieces:
  tf     (doc_id, term, tf)      — disjoint doc ranges: plain union
  df     (term, df)              — union + groupBy(term).sum
  stats  (n_docs, total_len)     — scalar sums
idf/avgdl are DERIVED (non-associative: epsilon floor needs the global
avg of raw idf), so they are recomputed from merged df/stats — cheap
(vocabulary-sized), and the result is IDENTICAL to a from-scratch build
over the union corpus (tests/test_merge.py asserts this).

On Iceberg this is `append` of tf-shards + a compaction of the df table
(MERGE INTO term ... WHEN MATCHED THEN UPDATE SET df = df + delta);
in the sandbox both sides are DataFrames.
"""

from __future__ import annotations

from ..operators.build import BM25Params, InvertedIndex, idf_table


def merge_tf(tf_old, tf_new):
    """Union of tf tables. Doc ranges are disjoint by construction
    (appended docs get new ids), so no re-aggregation is needed; a
    groupBy-sum is used anyway to make the merge idempotent under
    re-delivered batches (exactly-once via idempotent re-agg)."""
    from pyspark.sql import functions as F

    return (
        tf_old.unionByName(tf_new)
        .groupBy("doc_id", "term")
        .agg(F.max("tf").alias("tf"))
    )


def merge_index(old: InvertedIndex, new_docs_with_id, text_col: str = "content") -> InvertedIndex:
    """Merge an already-built index with a batch of NEW docs (unique new
    doc_ids) → a full InvertedIndex equal to a from-scratch build over
    the union. Only the new docs are tokenized; df/idf/avgdl are
    recomputed from merged aggregates (vocabulary-scale work)."""
    from pyspark.sql import functions as F

    from ..operators.build import build_index_from, doc_freqs

    new_idx = build_index_from(
        new_docs_with_id, text_col=text_col, params=old.params, cache=False
    )
    docs = old.docs.unionByName(new_idx.docs, allowMissingColumns=True)
    tf = merge_tf(old.tf, new_idx.tf)
    n_docs = old.n_docs + new_idx.n_docs
    total_len = (
        old.n_docs * old.avgdl + new_idx.n_docs * new_idx.avgdl
    )
    avgdl = total_len / n_docs if n_docs else 0.0
    idf, avg_idf = idf_table(doc_freqs(tf), n_docs, old.params.epsilon)
    return InvertedIndex(
        docs=docs,
        tf=tf,
        idf=idf,
        n_docs=n_docs,
        avgdl=avgdl,
        avg_idf=avg_idf,
        params=old.params,
    )


def stream_ingest(
    spark,
    source_dir: str,
    index_state: dict,
    schema: str,
    id_offset_col: str = "doc_id",
    text_col: str = "content",
    checkpoint_dir: str | None = None,
):
    """Structured Streaming ingest: watch source_dir for new corpus
    files; each micro-batch merges into the index via foreachBatch
    (the standard pattern for stateful sinks Spark doesn't ship).

    index_state: {"index": InvertedIndex} mutated per batch — batch
    boundaries give exactly-once merge semantics together with the
    idempotent merge_tf re-aggregation. Returns the StreamingQuery
    (caller awaits/stops it).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def on_batch(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        index_state["index"] = merge_index(
            index_state["index"], batch_df, text_col=text_col
        )

    writer = stream.writeStream.foreachBatch(on_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()

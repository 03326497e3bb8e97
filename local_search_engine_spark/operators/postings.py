"""Compressed posting-list construction (the engine's replacement for
rank_bm25's in-memory dict-of-dicts, built by the reference at
preprocessing.py:513).

Physical layout — designed for 10^12-doc scale:

  * Docs are DOC-RANGE SHARDED: part_id = doc_id // docs_per_shard.
    This is the hot-term skew strategy (north_rule; SURVEY.md §4.2):
    a term like `def` with df ≈ N never lands in one task — its postings
    are split across all shards, so the per-group work in the encode
    stage is bounded by the shard size regardless of df. The shard id is
    a deterministic salt; "merging salted sub-lists" is free because doc
    ranges are disjoint and ordered — the global posting list for a term
    is just its shard blocks read in (part_id, block_id) order.

  * Within a shard, blocks are doc-range aligned (block_id =
    doc_id // block_span) and carry block_max_score = max per-posting
    BM25 contribution (qtf=1) — the WAND upper bound. Scores are
    build-time computable because BM25's per-(term,doc) term depends
    only on (tf, doc_len, idf, avgdl).

  * Per-shard doc_len arrays are packed once per shard (int32 binary),
    NOT per posting — query-time scoring looks norms up locally.

Schema:
  postings:     term, term_bucket, part_id, block_id, n, first_doc_id,
                last_doc_id, doc_ids_vb, tfs_vb, block_max_score
  shard_meta:   part_id, first_doc_id, n_docs, doc_lens (binary i32)

term_bucket = pmod(xxhash64(term), n_buckets) is the Parquet partition
column: a query's `term IN (...)` filter prunes to ≤ |q| buckets at the
file level (partition pruning), then Parquet min/max row-group stats on
the sorted `term` column prune within buckets.
"""

from __future__ import annotations

POSTINGS_SCHEMA = (
    "term string, term_bucket int, part_id long, block_id long, n int, "
    "first_doc_id long, last_doc_id long, doc_ids_vb binary, tfs_vb binary, "
    "block_max_score double"
)
SHARD_META_SCHEMA = "part_id long, first_doc_id long, n_docs int, doc_lens binary"

DEFAULT_DOCS_PER_SHARD = 50_000
DEFAULT_N_BUCKETS = 64


def build_postings(
    index,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    block_span: int | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
):
    """index: operators.build.InvertedIndex → (postings DF, shard_meta DF).

    Plan: tf ⋈ broadcast(idf) ⋈ doc_len → one shuffle on (term_bucket,
    term, part_id) via applyInPandas → per-group numpy block encode.
    idf is broadcast (vocabulary table is small relative to postings);
    at extreme vocabularies swap to a sort-merge join — same code path.
    """
    from pyspark.sql import functions as F

    from ..functions.codec import DEFAULT_BLOCK_SPAN

    span = block_span or DEFAULT_BLOCK_SPAN
    k1, b = index.params.k1, index.params.b
    avgdl = index.avgdl

    tf = index.tf.withColumn(
        "part_id", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long")
    ).withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    joined = tf.join(F.broadcast(index.idf.select("term", "idf")), "term").join(
        index.docs.select("doc_id", "doc_len"), "doc_id"
    )

    def encode_group(pdf):
        import numpy as np
        import pandas as pd

        from ..functions.codec import bm25_term_scores, encode_block

        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        bucket = int(pdf["term_bucket"].iloc[0])
        part = int(pdf["part_id"].iloc[0])
        idf = float(pdf["idf"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doc_len"].to_numpy(np.int64)
        scores = bm25_term_scores(tfs, dls, idf, k1, b, avgdl)
        block_ids = doc_ids // span
        out = []
        for bid in np.unique(block_ids):
            m = block_ids == bid
            d, t, s = doc_ids[m], tfs[m], scores[m]
            dvb, tvb = encode_block(d, t, block_base=int(bid) * span)
            out.append(
                (
                    term,
                    bucket,
                    part,
                    int(bid),
                    int(d.size),
                    int(d[0]),
                    int(d[-1]),
                    dvb,
                    tvb,
                    float(s.max()),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "term",
                "term_bucket",
                "part_id",
                "block_id",
                "n",
                "first_doc_id",
                "last_doc_id",
                "doc_ids_vb",
                "tfs_vb",
                "block_max_score",
            ],
        )

    postings = joined.groupBy("term_bucket", "term", "part_id").applyInPandas(
        encode_group, POSTINGS_SCHEMA
    )

    def pack_shard(pdf):
        import numpy as np
        import pandas as pd

        from ..functions.codec import pack_i32

        pdf = pdf.sort_values("doc_id")
        return pd.DataFrame(
            [
                (
                    int(pdf["part_id"].iloc[0]),
                    int(pdf["doc_id"].iloc[0]),
                    len(pdf),
                    pack_i32(pdf["doc_len"].to_numpy(np.int32)),
                )
            ],
            columns=["part_id", "first_doc_id", "n_docs", "doc_lens"],
        )

    shard_meta = (
        index.docs.select("doc_id", "doc_len")
        .withColumn("part_id", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long"))
        .groupBy("part_id")
        .applyInPandas(pack_shard, SHARD_META_SCHEMA)
    )
    return postings, shard_meta

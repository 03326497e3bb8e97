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
    doc_id // block_span) and carry IDF-FREE block-max metadata:
    block_max_tf (max tf in the run) and block_min_dl (min doc_len
    among the run's docs). The WAND upper bound is derived at QUERY
    time as idf⁺ · qtf · (k1+1)·max_tf / (max_tf + k1·(1−b+b·min_dl/
    avgdl)) — a true bound because the BM25 contribution is increasing
    in tf and decreasing in doc_len. Baking the score itself into the
    block (the earlier design) couples every block to the GLOBAL idf /
    avgdl: one appended batch changes N, df and avgdl and silently
    invalidates every block's bound. With doc-local metadata a block
    depends only on its own shard's (doc_id, tf, doc_len), so
    incremental maintenance can skip untouched shards soundly
    (plans/checkpoint.update semantics), at the cost of a marginally
    looser bound (fewer skips, never wrong results).

  * Per-shard doc_len arrays are packed once per shard (int32 binary),
    NOT per posting — query-time scoring looks norms up locally.

Schema:
  postings:     term, term_bucket, part_id, block_id, n, first_doc_id,
                last_doc_id, doc_ids_vb, tfs_vb, block_max_tf,
                block_min_dl
  shard_meta:   part_id, first_doc_id, n_docs, doc_lens (binary i32)

term_bucket = pmod(h32(term), n_buckets) (portable md5-derived hash,
driver-computable) is the Parquet partition column: a query's `term IN (...)` filter prunes to ≤ |q| buckets at the
file level (partition pruning), then Parquet min/max row-group stats on
the sorted `term` column prune within buckets.
"""

from __future__ import annotations

POSTINGS_SCHEMA = (
    "term string, term_bucket int, part_id long, block_id long, n int, "
    "first_doc_id long, last_doc_id long, doc_ids_vb binary, tfs_vb binary, "
    "block_max_tf int, block_min_dl int"
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

    Plan: tf ⋈ doc_len → one shuffle on (term_bucket, part_id) via
    applyInPandas → per-group numpy block encode. No idf join: block
    metadata is idf/avgdl-free by design (see module docstring), so the
    encode touches ONLY shard-local inputs — which both removes a
    vocabulary-sized join from the build's hot path and makes per-shard
    incremental re-encoding sound. The doc_len join is left to AQE
    (broadcast when actually small)."""
    from pyspark.sql import functions as F

    from ..functions.codec import DEFAULT_BLOCK_SPAN

    span = block_span or DEFAULT_BLOCK_SPAN

    from ..functions.hashing import h32_col

    # bucket hash is the PORTABLE h32 (md5-derived) — its driver-side
    # twin h32_py lets the query path derive bucket literals for
    # partition pruning without running a Spark job per query
    tf = index.tf.withColumn(
        "part_id", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long")
    ).withColumn("term_bucket", F.pmod(h32_col(F.col("term")), F.lit(n_buckets)).cast("int"))
    joined = tf.join(index.docs.select("doc_id", "doc_len"), "doc_id")

    def encode_group(pdf):
        """One call per (term_bucket, part_id) — NOT per term. Grouping by
        term would mean one Arrow slice + pandas frame + Python call per
        vocabulary word (~ms each: pure fan-out overhead at millions of
        terms). Instead each call gets a whole bucket-shard and encodes
        every (term, block) run with vectorized run-boundary numpy; the
        only per-output-row Python is a bytes slice."""
        import numpy as np
        import pandas as pd

        from ..functions.codec import encode_vb_sliced

        cols = [
            "term",
            "term_bucket",
            "part_id",
            "block_id",
            "n",
            "first_doc_id",
            "last_doc_id",
            "doc_ids_vb",
            "tfs_vb",
            "block_max_tf",
            "block_min_dl",
        ]
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values(["term", "doc_id"])
        bucket = int(pdf["term_bucket"].iloc[0])
        part = int(pdf["part_id"].iloc[0])
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doc_len"].to_numpy(np.int64)
        block_ids = doc_ids // span
        n = doc_ids.size
        # run = maximal span of equal (term, block_id) — one output row each
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (terms[1:] != terms[:-1]) | (block_ids[1:] != block_ids[:-1])
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], n)
        # in-block deltas: first-of-run is offset from the block base; the
        # rest are consecutive diffs (diffs across run boundaries are
        # overwritten before the uint64 cast, so no negative wraparound)
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = 0
        deltas[1:] = np.diff(doc_ids)
        deltas[run_starts] = doc_ids[run_starts] - block_ids[run_starts] * span
        doc_vbs = encode_vb_sliced(deltas.astype(np.uint64), run_starts)
        tf_vbs = encode_vb_sliced(tfs.astype(np.uint64), run_starts)
        return pd.DataFrame(
            {
                "term": terms[run_starts],
                "term_bucket": bucket,
                "part_id": part,
                "block_id": block_ids[run_starts],
                "n": (run_ends - run_starts).astype(np.int32),
                "first_doc_id": doc_ids[run_starts],
                "last_doc_id": doc_ids[run_ends - 1],
                "doc_ids_vb": doc_vbs,
                "tfs_vb": tf_vbs,
                "block_max_tf": np.maximum.reduceat(tfs, run_starts).astype(
                    np.int32
                ),
                "block_min_dl": np.minimum.reduceat(dls, run_starts).astype(
                    np.int32
                ),
            },
            columns=cols,
        )

    def encode_partition(batches):
        """One hash repartition colocates each (term_bucket, part_id)
        group; the kernel groups a partition's rows in pandas and runs
        the per-group encoder — byte-identical output rows, but ONE
        Arrow round trip per partition instead of per group (the
        grouped-map machinery measured ~1 s of pure overhead for the
        ~2 000 bucket-shard groups at sf1.0 — same finding as the WAND
        delivery rewrite)."""
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        outs = [
            encode_group(grp)
            for _, grp in allp.groupby(["term_bucket", "part_id"], sort=False)
        ]
        if outs:
            yield pd.concat(outs, ignore_index=True)

    postings = joined.repartition("term_bucket", "part_id").mapInPandas(
        encode_partition, POSTINGS_SCHEMA
    )

    def pack_partition(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codec import pack_i32

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        allp = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        rows = []
        for pid, grp in allp.groupby("part_id", sort=False):
            grp = grp.sort_values("doc_id")
            rows.append(
                (
                    int(pid),
                    int(grp["doc_id"].iloc[0]),
                    len(grp),
                    pack_i32(grp["doc_len"].to_numpy(np.int32)),
                )
            )
        yield pd.DataFrame(
            rows, columns=["part_id", "first_doc_id", "n_docs", "doc_lens"]
        )

    shard_meta = (
        index.docs.select("doc_id", "doc_len")
        .withColumn("part_id", (F.col("doc_id") / F.lit(docs_per_shard)).cast("long"))
        .repartition("part_id")
        .mapInPandas(pack_partition, SHARD_META_SCHEMA)
    )
    return postings, shard_meta

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
over the union corpus (tests/test_streaming.py asserts this).

Two shapes live here:

  * merge_index — in-memory DataFrame merge of TWO indexes (one-shot
    batch append; the index_merge_incremental gate). Fine for a single
    merge; do NOT loop it — N merges build an N-deep union lineage.
  * PersistedIndexState — the SCALE path for continuous ingest: each
    batch appends O(batch) parquet (tf + docs deltas under
    batch=<id>/ dirs, idempotent per batch id, so re-delivered batches
    are exactly-once), NOTHING global is recomputed per batch, and any
    later read is a flat parquet scan — plan depth is CONSTANT in the
    number of batches. df/idf/avgdl are derived once at load_index()
    time (vocabulary-scale work). On Iceberg the appends become table
    appends and load-time df becomes MERGE-maintained; the layout here
    is the plain-parquet equivalent.
"""

from __future__ import annotations

import json
import os

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


class PersistedIndexState:
    """Parquet-backed incremental index state with bounded lineage.

    Layout under state_dir/:
      tf/batch=<id>/    (doc_id, term, tf) rows for that batch only
      docs/batch=<id>/  (doc_id, doc_len) rows for that batch only
      _batches.json     {batch_id: {"n_docs": .., "rows": ..}} commit log

    append_batch(docs) tokenizes ONLY the batch and writes its deltas —
    per-batch cost is O(batch), independent of how much state exists
    (the append plan never reads prior state). The per-batch-dir
    overwrite + commit-log check makes re-delivered batch ids exactly-
    once. load_index() is one flat parquet scan over all deltas plus the
    vocabulary-scale df/idf derivation — identical output to a
    from-scratch build over the union corpus. Doc-id uniqueness across
    batches is the caller's contract (appended docs get new ids), same
    as merge_index.
    """

    def __init__(self, spark, state_dir: str, params: BM25Params | None = None):
        self.spark = spark
        self.dir = state_dir
        self.params = params or BM25Params()
        self._log_path = os.path.join(state_dir, "_batches.json")
        os.makedirs(state_dir, exist_ok=True)
        self._log: dict[str, dict] = {}
        if os.path.exists(self._log_path):
            with open(self._log_path) as f:
                self._log = json.load(f)

    def committed(self, batch_id: int) -> bool:
        return str(batch_id) in self._log

    def append_batch(self, docs_with_id, batch_id: int, text_col: str = "content"):
        """Tokenize + write this batch's tf/docs deltas. Idempotent per
        batch_id; returns the commit-log entry (None if already done)."""
        from pyspark.sql import functions as F

        from ..operators.build import term_frequencies, tokenized_docs

        if self.committed(batch_id):
            return None
        tok = tokenized_docs(docs_with_id, text_col=text_col)
        # topology-auto tf (see build.term_frequencies): in-row single-JVM
        tf = term_frequencies(tok, impl="auto").cache()
        tf.write.mode("overwrite").parquet(
            os.path.join(self.dir, "tf", f"batch={batch_id}")
        )
        doc_lens = tf.groupBy("doc_id").agg(F.sum("tf").cast("int").alias("doc_len"))
        docs = (
            docs_with_id.select("doc_id")
            .join(doc_lens, "doc_id", "left")
            .withColumn("doc_len", F.coalesce(F.col("doc_len"), F.lit(0)))
        )
        docs.write.mode("overwrite").parquet(
            os.path.join(self.dir, "docs", f"batch={batch_id}")
        )
        entry = {"rows": tf.count(), "n_docs": docs_with_id.count()}
        tf.unpersist()
        self._log[str(batch_id)] = entry
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._log, f, indent=1, sort_keys=True)
        os.replace(tmp, self._log_path)
        return entry

    def compact(self) -> dict:
        """Rewrite all accumulated tf/docs deltas into one base batch dir
        and drop the per-batch dirs — bounds the small-file count after
        long ingest runs (the parquet equivalent of an Iceberg rewrite).
        The commit log keeps EVERY batch id it has seen, so re-delivered
        batches stay no-ops after compaction. Safe to re-run; crash
        between the new-base write and the old-dir removal leaves both
        readable-but-duplicated only within the _compact staging dir,
        never the live tree (stage → swap via os.replace)."""
        import shutil

        from pyspark.sql import functions as F

        spark = self.spark
        stats = {}
        dead = self.tombstones()
        for sub in ("tf", "docs"):
            live = os.path.join(self.dir, sub)
            if not os.path.isdir(live):
                continue
            stage = os.path.join(self.dir, f"_compact_{sub}")
            shutil.rmtree(stage, ignore_errors=True)
            df = spark.read.parquet(live)
            if dead:
                # the rewrite is the natural purge point: tombstoned
                # rows leave the physical layout here
                df = df.filter(~F.col("doc_id").isin(dead))
            df.write.mode("overwrite").parquet(
                os.path.join(stage, "batch=__base__")
            )
            stats[sub] = spark.read.parquet(stage).count()
            old = os.path.join(self.dir, f"_old_{sub}")
            shutil.rmtree(old, ignore_errors=True)
            os.replace(live, old)
            os.replace(stage, live)
            shutil.rmtree(old, ignore_errors=True)
        self._log["__compacted__"] = {"rows": stats.get("tf", 0)}
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._log, f, indent=1, sort_keys=True)
        os.replace(tmp, self._log_path)
        if dead:
            # physically purged above — clear the tombstone log (crash
            # between the swap and this point only leaves a redundant
            # logical filter, never resurrected rows)
            tpath = os.path.join(self.dir, "_tombstones.json")
            tmp = tpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump([], f)
            os.replace(tmp, tpath)
        return stats

    def delete_docs(self, doc_ids) -> int:
        """Logical delete (the GDPR/right-to-be-forgotten path): append
        the ids to a tombstone log. O(|delete|) — NOTHING existing is
        rewritten; load_index() applies tombstones exactly (broadcast
        anti-join of a user-sized id set), and the next
        build_persisted_index re-encodes precisely the postings groups
        whose shards contained deleted docs (their per-group content
        fingerprints change) while untouched groups stay manifest hits.
        Idempotent: re-deleting an id is a no-op. Returns the total
        tombstone count."""
        ids = sorted({int(i) for i in doc_ids})
        path = os.path.join(self.dir, "_tombstones.json")
        existing: list[int] = []
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        merged = sorted(set(existing) | set(ids))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, path)
        return len(merged)

    def tombstones(self) -> list[int]:
        path = os.path.join(self.dir, "_tombstones.json")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def load_index(self) -> InvertedIndex:
        """Flat-scan the accumulated deltas → full InvertedIndex. Plan
        depth is constant in batch count; df/idf/avgdl derived once.
        Tombstoned docs are excluded EXACTLY: docs/tf filtered before
        the stats/idf derivation, so n_docs, avgdl, df and the epsilon
        floor all reflect the post-delete corpus — identical to a
        from-scratch build over the surviving docs (test-pinned)."""
        from pyspark.sql import functions as F

        from ..operators.build import doc_freqs

        tf = self.spark.read.parquet(os.path.join(self.dir, "tf"))
        docs = self.spark.read.parquet(os.path.join(self.dir, "docs"))
        dead = self.tombstones()
        if dead:
            # tombstone sets are user-sized; isin compiles to an
            # in-filter pushed to the scan, no join or shuffle
            tf = tf.filter(~F.col("doc_id").isin(dead))
            docs = docs.filter(~F.col("doc_id").isin(dead))
        row = docs.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).first()
        n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        idf, avg_idf = idf_table(doc_freqs(tf), n_docs, self.params.epsilon)
        return InvertedIndex(
            docs=docs,
            tf=tf,
            idf=idf,
            n_docs=n_docs,
            avgdl=avgdl,
            avg_idf=avg_idf,
            params=self.params,
        )


def stream_ingest(
    spark,
    source_dir: str,
    index_state,
    schema: str,
    id_offset_col: str = "doc_id",
    text_col: str = "content",
    checkpoint_dir: str | None = None,
):
    """Structured Streaming ingest: watch source_dir for new corpus
    files; each micro-batch lands in the index via foreachBatch (the
    standard pattern for stateful sinks Spark doesn't ship).

    index_state is either
      * a PersistedIndexState — the scale path: each batch appends its
        O(batch) delta; exactly-once via the per-batch commit log on top
        of the streaming checkpoint; or
      * a {"index": InvertedIndex} dict — the legacy in-memory merge
        (bounded batch counts only: lineage grows per merge).
    Returns the StreamingQuery (caller awaits/stops it).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    if isinstance(index_state, PersistedIndexState):

        def on_batch(batch_df, batch_id: int):
            if batch_df.isEmpty():
                return
            index_state.append_batch(batch_df, batch_id, text_col=text_col)

    else:

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

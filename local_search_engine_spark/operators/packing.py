"""Training-sequence packing: group documents into fixed token-budget
sequences (the batch-construction stage of an LLM pretraining pipeline —
short documents are concatenated up to the context length so padding
doesn't dominate).

No reference analogue (the reference is a search engine); this is part
of the beyond-reference training-data surface. Spark-first shape:

  * packing is inherently sequential, so the distribution axis is the
    PARTITION: docs are range-partitioned + sorted by doc_id
    (deterministic), and each partition packs its own run greedily via
    mapInPandas with carry-over state ACROSS Arrow batches — one pass,
    no extra shuffle after the range partition, memory bounded by one
    batch + the open sequence, embarrassingly parallel at 100 TB.
  * seq_id = the first doc_id in the sequence — globally unique with
    zero coordination (every doc is in exactly one sequence).
  * the only cross-partition effect is that a partition boundary closes
    the open sequence early; with budget-sized docs « partition-sized
    runs the fill-ratio loss is O(partitions / docs), and packing for a
    FIXED partition count is fully deterministic (test-pinned).
  * docs larger than the budget get a sequence of their own with
    needs_split=true — flagged, never silently truncated; splitting is
    the chunker's job upstream (operators/chunking.py).
"""

from __future__ import annotations

PACKED_SCHEMA = (
    "seq_id long, doc_ids array<long>, n_docs int, total_tokens long, "
    "needs_split boolean"
)


def pack_sequences(
    docs,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int | None = None,
):
    """(seq_id, doc_ids, n_docs, total_tokens, needs_split): greedy
    first-fit packing of docs into sequences of <= `budget` tokens.

    Every doc appears in exactly one sequence; sequences never exceed
    the budget unless they hold a single oversized doc (needs_split).
    Deterministic for a fixed `partitions` (default: current shuffle
    partitions)."""
    from pyspark.sql import functions as F

    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = docs.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    slim = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(partitions, "doc_id")
        .sortWithinPartitions("doc_id")
    )

    def pack_partition(batches):
        import pandas as pd

        cur_ids: list[int] = []
        cur_tok = 0
        out = {
            "seq_id": [],
            "doc_ids": [],
            "n_docs": [],
            "total_tokens": [],
            "needs_split": [],
        }

        def flush():
            nonlocal cur_ids, cur_tok
            if not cur_ids:
                return
            out["seq_id"].append(cur_ids[0])
            out["doc_ids"].append(list(cur_ids))
            out["n_docs"].append(len(cur_ids))
            out["total_tokens"].append(cur_tok)
            out["needs_split"].append(len(cur_ids) == 1 and cur_tok > budget)
            cur_ids, cur_tok = [], 0

        for pdf in batches:
            for did, nt in zip(pdf["doc_id"], pdf["n_tokens"]):
                nt = int(nt)
                if cur_ids and cur_tok + nt > budget:
                    flush()
                cur_ids.append(int(did))
                cur_tok += nt
                if cur_tok > budget:  # single oversized doc
                    flush()
            if out["seq_id"]:
                yield pd.DataFrame(out)
                out = {k: [] for k in out}
        flush()
        if out["seq_id"]:
            yield pd.DataFrame(out)

    return slim.mapInPandas(pack_partition, PACKED_SCHEMA)

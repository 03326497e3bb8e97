"""Bench harness — headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Coverage (the north-rule headline path plus the training-data-pipeline
operators): full BM25 index build (tokenize → tf → df/idf two-pass
epsilon floor), compressed block-max postings build, brute-force batch
BM25 top-k, block-max WAND top-k, exact + MinHash-LSH dedup, embedding
cosine top-k, text quality/fingerprint scans.

Every timing forces a real materialization (count / collect of the final
small result), never a bare .explain. Scaling-efficiency evidence
(local[8] vs local[32] on the same input) is produced by
scripts/bench_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    try:
        return float(m.group(1).rstrip(".")) if m else -1.0
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from local_search_engine_spark.operators import dedup as D
    from local_search_engine_spark.operators import similarity as SIM
    from local_search_engine_spark.operators import textstats as TS
    from local_search_engine_spark.operators.build import build_index_from
    from local_search_engine_spark.operators.postings import build_postings
    from local_search_engine_spark.operators.query import run_query_set
    from local_search_engine_spark.operators.wand import make_wand_topk
    from local_search_engine_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs_in = docs.count()  # warm the scan outside any timed region
    emb.count()

    timings: dict[str, float] = {}

    def bench(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                timings[name] = round(time.time() - self.t0, 4)

        return _T()

    # untimed warmup: a miniature build exercises the same codegen/JIT
    # paths (tokenize explode, hash aggs, posting encode) so the timed
    # regions measure the engine, not first-action JVM warmup — the same
    # protocol as scripts/bench_scaling.py. Round-1/2 bench showed ±40%
    # run-to-run variance on index_build without this.
    wi = build_index_from(docs.limit(300), text_col="text", cache=False)
    build_postings(wi, docs_per_shard=200, block_span=64, n_buckets=8)[0].count()
    wi.idf.count()

    # --- index build: the north-rule headline (docs/sec) ---------------
    with bench("index_build"):
        idx = build_index_from(docs, text_col="text")
        idx.tf.count()
        idx.idf.count()
    docs_per_sec = round(n_docs_in / max(timings["index_build"], 1e-9), 2)

    # --- compressed block-max postings over the built index ------------
    with bench("postings_build"):
        postings, shard_meta = build_postings(
            idx, docs_per_shard=200, block_span=64, n_buckets=8
        )
        postings = postings.cache()
        shard_meta = shard_meta.cache()
        postings.count()
        shard_meta.count()

    # --- query paths ----------------------------------------------------
    qset = [
        (0, "table", 10),
        (1, "fast merge join query", 10),
        (2, "spark window", 5),
        (3, "customer order line", 15),
    ]
    with bench("bm25_batch_bruteforce"):
        run_query_set(idx, qset).collect()

    wand = make_wand_topk(idx, postings, shard_meta, block_span=64)
    with bench("bm25_wand_topk"):
        wand("fast merge join query", 20, prune=True).collect()
    with bench("bm25_wand_batch"):
        wand.query_set(qset, prune=True).collect()

    # --- training-data-pipeline operators -------------------------------
    with bench("dedup_exact"):
        D.exact_dedup_groups(docs, "text", "doc_id").count()
    with bench("dedup_minhash_lsh"):
        D.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, bands=4, threshold=0.7
        ).count()
    with bench("dedup_simhash_pairs"):
        D.simhash_pairs(docs, "text", "doc_id", max_hamming=3, n_bands=4).count()
    with bench("dedup_embedding_lsh"):
        D.embedding_neardup_lsh_pairs(emb, dim=64, threshold=0.9, bits=8).count()
    with bench("ann_cosine_topk"):
        qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        (
            SIM.cosine_scores(emb, qv)
            .filter(F.col("id") != 0)
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(10)
            .collect()
        )
    with bench("text_quality"):
        TS.quality_scores(docs, "text", "doc_id").count()
    with bench("text_fingerprint"):
        TS.doc_fingerprints(docs, "text", "doc_id").count()
    with bench("embed_docs"):
        from local_search_engine_spark.functions.embed import embed_docs

        embed_docs(docs, "text", "doc_id", dim=32).count()
    with bench("chunk_separators"):
        from local_search_engine_spark.operators.chunking import (
            chunk_docs_separators,
        )

        chunk_docs_separators(docs, "text", "doc_id").count()
    with bench("temporal_flexible"):
        import datetime

        from local_search_engine_spark.operators.fusion import temporal_flexible

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        temporal_flexible(
            ev,
            "ts",
            start=datetime.datetime(2024, 1, 8),
            end=datetime.datetime(2024, 1, 15),
            now=datetime.datetime(2024, 2, 1),
        ).count()
    with bench("hybrid_search"):
        from local_search_engine_spark.operators.retrieval import hybrid_search

        fused, _ = hybrid_search(
            idx, emb, "how to implement merge join", qv, k=20
        )
        fused.collect()
    with bench("spell_correct"):
        from local_search_engine_spark.operators.spell import correct_tokens

        correct_tokens(
            idx.idf.select("term", "df"),
            ["merg", "tabel", "windw", "query"],
            max_d=2,
        ).collect()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bm25_engine_bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
                "n_docs": n_docs_in,
                "docs_per_sec": docs_per_sec,
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

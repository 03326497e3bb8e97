"""Run top-k BM25 queries against a persisted index.

Usage:
  python scripts/run_queries.py --index data/index_sf0.1 --query "def merge shard" --k 10
  python scripts/run_queries.py --index data/index_sf0.1 --fixture-queries --n-docs 10000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.operators.wand import make_wand_topk
from local_search_engine_spark.plans.checkpoint import load_index
from local_search_engine_spark.session import get_spark
from local_search_engine_spark.sources.corpus import query_set


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--fixture-queries", action="store_true")
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-prune", action="store_true")
    args = ap.parse_args()

    spark = get_spark("run-queries", cores=args.cores)
    idx, postings, shard_meta, stats = load_index(spark, args.index)
    postings = postings.cache()
    shard_meta = shard_meta.cache()
    wand = make_wand_topk(
        idx,
        postings,
        shard_meta,
        block_span=stats["block_span"],
        # legacy indexes (no bucket_hash field) used a different bucket
        # hash — never prune those with h32 literals
        n_buckets=stats.get("n_buckets") if stats.get("bucket_hash") == "h32" else None,
    )

    queries = (
        [(0, args.query, args.k)]
        if args.query
        else query_set(args.n_docs)
        if args.fixture_queries
        else []
    )
    for qid, text, k in queries:
        t0 = time.time()
        rows = wand(text, k, prune=not args.no_prune).collect()
        ms = (time.time() - t0) * 1000
        print(
            json.dumps(
                {
                    "query_id": qid,
                    "query": text,
                    "k": k,
                    "ms": round(ms, 1),
                    "hits": [
                        {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}
                        for r in rows
                    ],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Build / append / compact / query a persisted POSITIONAL phrase index.

Local sandbox:
  python scripts/pos_index.py build   --docs corpus.parquet --index /tmp/pos \
      [--text-col text --id-col doc_id --docs-per-shard 50000 --n-buckets 16]
  python scripts/pos_index.py append  --docs new_batch.parquet --index /tmp/pos
  python scripts/pos_index.py compact --index /tmp/pos
  python scripts/pos_index.py query   --index /tmp/pos --phrase "merge shard" --k 10
  python scripts/pos_index.py query   --index /tmp/pos --phrase "merge shard" \
      --near 4 --k 10      # ±window proximity instead of exact adjacency

The index is the bucket-partitioned layout of
operators/positional.py: appends are strictly-tailing doc-id batches
(O(batch) new parquet, existing files untouched), `compact` rewrites
appended fragments through the canonical encoder (row-identical to a
fresh build, shrinks the small-file count — run it every N appends),
and query-time scans prune whole term_bucket directories from
driver-computed literals. spark-submit-shaped like the sibling scripts;
doc ids must be dense engine ids (0 <= id < 2^31)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.operators.positional import (
    append_positional_postings,
    build_positional_postings,
    compact_positional_postings,
    load_positional_meta,
    load_positional_postings,
    make_phrase_topk,
    persist_positional_postings,
)
from local_search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "append", "compact", "query"])
    ap.add_argument("--docs", help="parquet with (id, text) for build/append")
    ap.add_argument("--index", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--docs-per-shard", type=int, default=50_000)
    ap.add_argument("--block-span", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--phrase")
    ap.add_argument("--near", type=int, default=None, help="±window proximity")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(f"pos-index-{args.cmd}", cores=args.cores)
    t0 = time.time()

    if args.cmd == "build":
        from local_search_engine_spark.functions.codec import DEFAULT_BLOCK_SPAN

        docs = spark.read.parquet(args.docs)
        params = {
            "docs_per_shard": args.docs_per_shard,
            "block_span": args.block_span or DEFAULT_BLOCK_SPAN,
            "n_buckets": args.n_buckets,
        }
        persist_positional_postings(
            build_positional_postings(
                docs, text_col=args.text_col, id_col=args.id_col, **params
            ),
            args.index,
            params=params,
        )
        meta = load_positional_meta(args.index)
        print(json.dumps({"cmd": "build", **meta,
                          "wall_sec": round(time.time() - t0, 2)}))
    elif args.cmd == "append":
        docs = spark.read.parquet(args.docs)
        meta = append_positional_postings(
            spark, args.index, docs, text_col=args.text_col, id_col=args.id_col
        )
        print(json.dumps({"cmd": "append", **meta,
                          "wall_sec": round(time.time() - t0, 2)}))
    elif args.cmd == "compact":
        info = compact_positional_postings(spark, args.index)
        print(json.dumps({"cmd": "compact", **info,
                          "wall_sec": round(time.time() - t0, 2)}))
    else:
        if not args.phrase:
            raise SystemExit("query needs --phrase")
        meta = load_positional_meta(args.index) or {}
        q = make_phrase_topk(
            load_positional_postings(spark, args.index),
            block_span=meta.get("block_span"),
            n_buckets=meta.get("n_buckets"),
        )
        out = (
            q.near(args.phrase, args.k, args.near)
            if args.near is not None
            else q(args.phrase, args.k)
        )
        count_col = "n_anchors" if args.near is not None else "phrase_tf"
        rows = [
            {"rank": r["rank"], "doc_id": r["doc_id"], count_col: int(r[count_col])}
            for r in out.collect()
        ]
        print(json.dumps({"cmd": "query", "phrase": args.phrase,
                          "near": args.near, "k": args.k, "results": rows,
                          "wall_sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Build (or resume) the compressed inverted index from a corpus table.

Local sandbox:   python scripts/build_index.py --corpus data/corpus_sf0.1 --index data/index_sf0.1
Real cluster:    spark-submit --py-files engine.zip scripts/build_index.py \
                   --corpus lake.db.corpus --format iceberg --index s3://.../index \
                   (shuffle partitions ≈ 2-3x total executor cores)

The build is resumable: re-running with the same corpus fingerprint
skips completed stages/groups via the manifest (_manifest.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.operators.build import BM25Params
from local_search_engine_spark.plans.checkpoint import build_persisted_index
from local_search_engine_spark.session import get_spark
from local_search_engine_spark.sources.corpus import read_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--epsilon", type=float, default=0.25)
    ap.add_argument("--docs-per-shard", type=int, default=50_000)
    ap.add_argument("--block-span", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--n-groups", type=int, default=8)
    ap.add_argument(
        "--pdf-col",
        default=None,
        metavar="COL",
        help="corpus column holding PDF binaries; text is extracted from it "
        "(dependency-free parser, operators/multimodal.pdf_extract) and "
        "indexed as `content`. Rows whose PDFs use unsupported codecs are "
        "counted and SKIPPED (extract_ok=false), never silently indexed "
        "as empty.",
    )
    args = ap.parse_args()

    spark = get_spark("build-index", cores=args.cores)
    corpus = read_corpus(spark, args.corpus, args.format)
    decoded_cached = None
    if args.pdf_col:
        from pyspark.sql import functions as F

        from local_search_engine_spark.operators.multimodal import pdf_to_text

        # persist the decoded frame (memory-and-disk) so the bad-row
        # count and the index build share ONE pdf_to_text pass — the
        # mapInPandas decode is the most expensive stage here and an
        # uncached plan re-parses every PDF for each action (r05, ADVICE)
        decoded_cached = pdf_to_text(
            corpus, payload_col=args.pdf_col, out_col="content"
        ).persist()
        n_bad = decoded_cached.filter(~F.col("extract_ok")).count()
        if n_bad:
            print(f"skipping {n_bad} rows with unsupported PDF codecs", file=sys.stderr)
        corpus = decoded_cached.filter("extract_ok").drop("n_pages", "extract_ok")
    t0 = time.time()
    try:
        build_persisted_index(
            spark,
            corpus,
            args.index,
            params=BM25Params(k1=args.k1, b=args.b, epsilon=args.epsilon),
            docs_per_shard=args.docs_per_shard,
            block_span=args.block_span,
            n_buckets=args.n_buckets,
            n_groups=args.n_groups,
        )
    finally:
        if decoded_cached is not None:
            decoded_cached.unpersist()
    wall = time.time() - t0
    with open(os.path.join(args.index, "stats.json")) as f:
        stats = json.load(f)
    print(
        json.dumps(
            {
                "n_docs": stats["n_docs"],
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(stats["n_docs"] / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

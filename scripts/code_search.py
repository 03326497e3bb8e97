"""Code-search CLI over an input_hint corpus (repo, path, commit, lang,
content) — the grep/def/related/suggest surface on top of the engine's
operators.

  python scripts/code_search.py index   --corpus DIR --out IDX_DIR
  python scripts/code_search.py grep    --corpus DIR --query 'foo_bar(' [--index IDX_DIR] [--regex]
  python scripts/code_search.py def     --corpus DIR --symbol mergeShards
  python scripts/code_search.py related --corpus DIR --file 'org0/repo1:src/mod5/file_56.py'
  python scripts/code_search.py suggest --bm25-index IDX_DIR --prefix mer

`index` persists the trigram inverted file; `grep` uses it when given
(bucket-pruned candidate AND + exact verify) and falls back to the full
verify scan without it. On a real cluster: the same commands via
spark-submit --py-files engine.zip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.session import get_spark
from local_search_engine_spark.sources.corpus import read_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["index", "grep", "def", "related", "suggest"])
    ap.add_argument("--corpus")
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--out")
    ap.add_argument("--index")
    ap.add_argument("--bm25-index")
    ap.add_argument("--query")
    ap.add_argument("--regex", action="store_true")
    ap.add_argument("--symbol")
    ap.add_argument("--file")
    ap.add_argument("--prefix")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark(f"code-search-{args.cmd}", cores=args.cores)
    t0 = time.time()
    corpus = read_corpus(spark, args.corpus, fmt=args.format) if args.corpus else None

    if args.cmd == "index":
        from pyspark.sql import functions as F

        from local_search_engine_spark.operators.trigram import build_trigram_index

        docs = corpus.withColumn(
            "file", F.concat_ws(":", F.col("repo"), F.col("path"))
        )
        build_trigram_index(docs, args.out, text_col="content", id_col="file")
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"cmd": "index", "postings": n,
                          "wall_sec": round(time.time() - t0, 2)}))
    elif args.cmd == "grep":
        from local_search_engine_spark.operators.trigram import (
            trigram_search,
            trigram_search_regex,
        )

        # grep needs file identity, not numeric ids — key rows by repo:path
        from pyspark.sql import functions as F

        docs = corpus.withColumn(
            "file", F.concat_ws(":", F.col("repo"), F.col("path"))
        )
        index = spark.read.parquet(args.index) if args.index else None
        fn = trigram_search_regex if args.regex else trigram_search
        hits = fn(docs, args.query, index=index, text_col="content", id_col="file")
        rows = [r["doc_id"] for r in hits.orderBy("doc_id").limit(args.k).collect()]
        print(json.dumps({"cmd": "grep", "query": args.query,
                          "regex": args.regex, "pruned": index is not None,
                          "hits": rows, "wall_sec": round(time.time() - t0, 2)}))
    elif args.cmd == "def":
        from pyspark.sql import functions as F

        from local_search_engine_spark.operators.symbols import extract_symbols

        docs = corpus.withColumn(
            "file", F.concat_ws(":", F.col("repo"), F.col("path"))
        )
        syms = extract_symbols(docs, text_col="content", lang_col="lang", id_col="file")
        hits = (
            syms.filter(F.col("symbol") == args.symbol)
            .orderBy("doc_id")
            .limit(args.k)
            .collect()
        )
        print(json.dumps({"cmd": "def", "symbol": args.symbol,
                          "defs": [{"file": r["doc_id"], "kind": r["kind"]} for r in hits],
                          "wall_sec": round(time.time() - t0, 2)}))
    elif args.cmd == "related":
        from local_search_engine_spark.operators.cochange import (
            co_change_edges,
            related_files,
        )

        edges = co_change_edges(corpus)
        rows = [
            {"file": r["other"], "weight": r["weight"]}
            for r in related_files(edges, args.file, k=args.k).collect()
        ]
        print(json.dumps({"cmd": "related", "file": args.file, "related": rows,
                          "wall_sec": round(time.time() - t0, 2)}))
    else:  # suggest
        from local_search_engine_spark.operators.query import suggest_terms
        from local_search_engine_spark.plans.checkpoint import load_index

        idx, _, _, _ = load_index(spark, args.bm25_index)
        rows = [
            {"term": r["term"], "df": r["df"]}
            for r in suggest_terms(idx, args.prefix, k=args.k).collect()
        ]
        print(json.dumps({"cmd": "suggest", "prefix": args.prefix,
                          "suggestions": rows,
                          "wall_sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

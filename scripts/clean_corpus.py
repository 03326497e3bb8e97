"""Corpus-cleaning CLI — the training-data prep entry point.

Usage:
  python scripts/clean_corpus.py --docs data/docs.parquet --out data/clean \
      [--benchmark data/eval.parquet] [--min-quality 0.3] [--sample-rate 0.5]

Reads a (doc_id, text, ...) parquet table, runs the composed cleaning
pipeline (exact-dedup keep ∧ quality floor ∧ Gopher repetition filter
∧ optional benchmark decontamination), optionally applies deterministic
hash sampling to the survivors, writes BOTH the verdict table
(out/verdicts — every doc with per-signal reasons, nothing silently
dropped) and the cleaned corpus (out/clean), and prints a one-line JSON
summary. spark-submit-shaped like build_index.py / run_queries.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.operators.pipeline import clean_corpus
from local_search_engine_spark.operators.sampling import hash_sample
from local_search_engine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--sample-salt", default="s0")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("clean-corpus", cores=args.cores)
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None

    verdicts = clean_corpus(
        docs,
        bench,
        args.text_col,
        args.id_col,
        min_quality=args.min_quality,
    ).cache()
    verdicts.write.mode("overwrite").parquet(os.path.join(args.out, "verdicts"))

    kept_ids = verdicts.filter("keep").select("doc_id")
    if args.sample_rate < 1.0:
        kept_ids = hash_sample(kept_ids, args.sample_rate, salt=args.sample_salt)
    cleaned = docs.withColumnRenamed(args.id_col, "doc_id").join(kept_ids, "doc_id")
    cleaned.write.mode("overwrite").parquet(os.path.join(args.out, "clean"))

    n_in = verdicts.count()
    n_keep = verdicts.filter("keep").count()
    n_out = cleaned.count()
    reasons = {
        "dup": verdicts.filter("is_dup").count(),
        "quality": verdicts.filter("NOT quality_ok").count(),
        "repetition": verdicts.filter("NOT repetition_pass").count(),
        "contaminated": verdicts.filter("NOT decontam_ok").count(),
    }
    print(
        json.dumps(
            {
                "metric": "clean_corpus",
                "n_in": n_in,
                "n_keep": n_keep,
                "n_written": n_out,
                "sample_rate": args.sample_rate,
                "dropped_by": reasons,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Pipeline-operator scale curve: minhash-LSH vs zero-shuffle row ops.

Re-runs the BENCH/BASELINE.md "Pipeline-operator scale curve" on demand,
this time ALWAYS reading the LSH operator's Observation metrics
(n_buckets / dropped_buckets / dropped_pairs_ub / max_bucket_size_seen)
so a hot bucket can never hide behind a wall-clock number. Protocol per
BENCH/BASELINE.md §7 (noisy host): per-size untimed warmup of the exact
timed plan, then min-of-N reps with caches dropped between reps; all
reps disclosed in the JSON output.

Usage:
  python scripts/bench_scale_curve.py [--sizes 5000,20000,80000,160000]
      [--reps 2] [--out BENCH/scale_curve.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_minhash(spark, docs, reps: int, collapse: bool = True):
    """Warmup + min-of-reps for minhash_lsh_pairs; returns (times, metrics).
    collapse=False is the legacy (pre-collapse-exact) arm, kept so the
    before/after comparison runs under IDENTICAL conditions in one
    process."""
    from local_search_engine_spark.operators.dedup import minhash_lsh_pairs

    times, metrics_out = [], {}
    for rep in range(reps + 1):  # rep 0 = warmup, untimed result discarded
        metrics: dict = {}
        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(
            docs, text_col="content", id_col="path", metrics=metrics,
            collapse_exact=collapse,
        )
        n_pairs = pairs.count()
        dt = time.monotonic() - t0
        obs = metrics["observation"].get if "observation" in metrics else {}
        metrics["shingle_sets"].unpersist()
        spark.catalog.clearCache()
        if rep > 0:
            times.append(round(dt, 2))
            metrics_out = {"n_pairs": n_pairs, **{k: int(v) for k, v in obs.items()}}
    return times, metrics_out


def time_minhash_reps_only(spark, docs, reps: int):
    """The representative-space scale path (expand_exact=False): cost
    tracks distinct content, never duplication mass — this is the curve
    the near-linear claim rides on; the expanded default's extra wall is
    output cardinality (the intra-group pair listing), reported
    alongside."""
    from local_search_engine_spark.operators.dedup import minhash_lsh_pairs

    times, n_out = [], 0
    for rep in range(reps + 1):
        metrics: dict = {}
        t0 = time.monotonic()
        n_out = minhash_lsh_pairs(
            docs, text_col="content", id_col="path",
            metrics=metrics, expand_exact=False,
        ).count()
        dt = time.monotonic() - t0
        metrics["shingle_sets"].unpersist()
        spark.catalog.clearCache()
        if rep > 0:
            times.append(round(dt, 2))
    return times, n_out


def time_simple(spark, fn, reps: int):
    times = []
    for rep in range(reps + 1):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        if rep > 0:
            times.append(round(dt, 2))
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,20000,80000,160000")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scale_curve.json"))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from local_search_engine_spark.operators.dedup import exact_dedup_groups
    from local_search_engine_spark.operators.textstats import repetition_scores
    from local_search_engine_spark.session import get_spark
    from local_search_engine_spark.sources.corpus import gen_corpus_spark

    spark = get_spark("scale-curve")
    out = {
        "protocol": (
            "BENCH/BASELINE.md §7/§10: corpus WRITTEN TO PARQUET per size and "
            "re-scanned by every rep (the realistic input shape — earlier "
            "revisions cached the Python-generated corpus, and the "
            "clearCache() between reps silently made later reps time corpus "
            "REGENERATION, not the operator); per-size warmup + min-of-%d; "
            "legacy arm = collapse_exact=False, same process/same input"
            % args.reps
        ),
        "points": [],
    }
    import shutil
    import tempfile

    corpus_root = tempfile.mkdtemp(prefix="scale-curve-corpus-")
    for n in sizes:
        cdir = os.path.join(corpus_root, f"n{n}")
        gen_corpus_spark(spark, n).write.mode("overwrite").parquet(cdir)
        docs = spark.read.parquet(cdir)
        mh_legacy_times, mh_legacy_metrics = time_minhash(
            spark, docs, args.reps, collapse=False
        )
        mh_times, mh_metrics = time_minhash(spark, docs, args.reps)
        repspace_times, repspace_npairs = time_minhash_reps_only(spark, docs, args.reps)
        ex_times = time_simple(
            spark,
            lambda: exact_dedup_groups(docs, text_col="content", id_col="path").count(),
            args.reps,
        )
        rep_times = time_simple(
            spark,
            lambda: repetition_scores(docs, text_col="content", id_col="path")
            .agg(F.sum("dup_2gram_frac"))
            .collect(),
            args.reps,
        )
        point = {
            "docs": n,
            "minhash_lsh_s": min(mh_times),
            "minhash_reps": mh_times,
            "minhash_docs_per_s": round(n / min(mh_times)),
            "lsh_metrics": mh_metrics,
            "minhash_legacy_s": min(mh_legacy_times),
            "minhash_legacy_reps": mh_legacy_times,
            "legacy_lsh_metrics": mh_legacy_metrics,
            "minhash_repspace_s": min(repspace_times),
            "minhash_repspace_reps": repspace_times,
            "minhash_repspace_pairs": repspace_npairs,
            "exact_dedup_s": min(ex_times),
            "exact_reps": ex_times,
            "repetition_s": min(rep_times),
            "repetition_reps": rep_times,
        }
        out["points"].append(point)
        print(json.dumps(point))
        spark.catalog.clearCache()
        shutil.rmtree(cdir, ignore_errors=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()

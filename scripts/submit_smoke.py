"""spark-submit driver app — the north-rule deployment path, literally:

    spark-submit --master local-cluster[2,2,1536] \
        --py-files engine.zip scripts/submit_smoke.py

The app imports the engine ONLY from the --py-files zip (no repo
sys.path fallback — the test invokes it from a neutral cwd with
PYTHONPATH scrubbed), generates a deterministic corpus with a
mapInPandas running package code ON THE EXECUTORS, builds the BM25
index, runs a top-k query, and drives an Arrow-batched signature kernel
— the full proof that a real multi-executor deployment via
spark-submit --py-files works end-to-end. Prints SUBMIT_SMOKE_OK on
success (asserted by tests/test_submit.py).
"""

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
    # imports AFTER the session exists: spark-submit has already placed
    # the --py-files zip on driver and executor python paths
    from pyspark.sql import functions as F

    from local_search_engine_spark.functions.hashing import h32_col
    from local_search_engine_spark.operators import dedup as D
    from local_search_engine_spark.operators.build import build_index
    from local_search_engine_spark.operators.query import topk
    from local_search_engine_spark.sources.corpus import gen_corpus_spark

    corpus = gen_corpus_spark(spark, 200, partitions=4)
    idx = build_index(corpus)
    rows = topk(idx, "def merge shard", 5).collect()
    assert len(rows) == 5, f"expected 5 hits, got {rows}"

    docs = corpus.select(
        h32_col(F.col("path")).alias("doc_id"), F.col("content").alias("text")
    )
    n_sigs = D.minhash_wide(docs).count()  # Arrow kernel on executors
    assert n_sigs == 200, f"expected 200 signatures, got {n_sigs}"

    print(f"SUBMIT_SMOKE_OK hits={len(rows)} sigs={n_sigs}")
    spark.stop()


if __name__ == "__main__":
    main()

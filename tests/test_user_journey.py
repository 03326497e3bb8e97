"""End-to-end user journey across the engine's surfaces in one flow:
generate corpus → persisted index build → autocomplete → WAND query →
snippet for the top hit → trigram grep for an exact substring the
tokenized index cannot express. Each piece is unit-tested elsewhere;
this pins the COMPOSITION (schemas, id spaces, and persisted artifacts
lining up across operators)."""

from __future__ import annotations

from local_search_engine_spark.operators.query import suggest_terms
from local_search_engine_spark.operators.snippets import best_snippets
from local_search_engine_spark.operators.trigram import (
    build_trigram_index,
    trigram_search,
)
from local_search_engine_spark.operators.wand import make_wand_topk
from local_search_engine_spark.plans.checkpoint import (
    build_persisted_index,
    load_index,
)
from local_search_engine_spark.sources.corpus import gen_corpus_spark


def test_full_code_search_journey(spark, tmp_path):
    from pyspark.sql import functions as F

    corpus = gen_corpus_spark(spark, 120, partitions=8)
    idx_dir = str(tmp_path / "idx")
    build_persisted_index(
        spark, corpus, idx_dir, docs_per_shard=32, block_span=8, n_buckets=8
    )
    idx, postings, shard_meta, stats = load_index(spark, idx_dir)

    # 1. autocomplete narrows a prefix to real vocabulary
    sugg = [r["term"] for r in suggest_terms(idx, "mer", 5).collect()]
    assert "merge" in sugg

    # 2. ranked retrieval over the persisted compressed index
    wand = make_wand_topk(
        idx, postings, shard_meta,
        block_span=stats["block_span"], n_buckets=stats["n_buckets"],
    )
    hits = wand("merge shard", 5).collect()
    assert 1 <= len(hits) <= 5 and hits[0]["rank"] == 1

    # 3. snippet for the top hit — docs joined back by the same doc_id
    # space the index assigned
    top_id = hits[0]["doc_id"]
    docs_with_text = corpus.withColumn("content_sha256", F.sha2("content", 256))
    id_map = idx.docs.select("doc_id", "content_sha256")
    top_doc = (
        docs_with_text.join(id_map, "content_sha256")
        .filter(F.col("doc_id") == top_id)
        .select("doc_id", F.col("content").alias("text"))
    )
    snip = best_snippets(top_doc, ["merge", "shard"], width=80).first()
    assert snip["n_hits"] >= 1
    assert ("merge" in snip["snippet"]) or ("shard" in snip["snippet"])

    # 4. exact-substring grep via the trigram index agrees with a scan
    docs = corpus.select(
        F.concat_ws(":", "repo", "path").alias("file"),
        F.col("content"),
    )
    tri_dir = str(tmp_path / "tri")
    build_trigram_index(docs, tri_dir, text_col="content", id_col="file")
    tri = spark.read.parquet(tri_dir)
    lit = "def "
    got = sorted(
        r["doc_id"]
        for r in trigram_search(docs, lit, index=tri, text_col="content", id_col="file").collect()
    )
    want = sorted(
        r["file"]
        for r in docs.filter(F.contains("content", F.lit(lit))).collect()
    )
    assert got == want and len(got) > 0

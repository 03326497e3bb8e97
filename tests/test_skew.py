"""Hot-term skew: a term appearing in EVERY document (df = N — the
'def'/'import' case the north rule names) must not concentrate in one
encode task or break WAND exactness. Doc-range sharding is the salt:
a hot term's postings split across all shards by construction
(operators/postings.py §docstring)."""

from local_search_engine_spark.operators.build import build_index_from
from local_search_engine_spark.operators.postings import build_postings
from local_search_engine_spark.operators.query import topk
from local_search_engine_spark.operators.wand import make_wand_topk

N_DOCS = 600
DOCS_PER_SHARD = 64


def corpus(spark):
    rows = [
        (i, f"hotterm everywhere_{'xyqz' if i % 7 else 'rare'} uniq_{i} filler_{i % 13}")
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_term_spreads_across_shards(spark):
    idx = build_index_from(corpus(spark), text_col="text", cache=False)
    postings, meta = build_postings(
        idx, docs_per_shard=DOCS_PER_SHARD, block_span=16, n_buckets=8
    )
    hot = postings.filter("term = 'hotterm'").collect()
    parts = {r.part_id for r in hot}
    # the hot term's postings live in EVERY doc-range shard...
    assert len(parts) == (N_DOCS + DOCS_PER_SHARD - 1) // DOCS_PER_SHARD
    # ...and no single block row holds more than one block-span of docs
    assert max(r.n for r in hot) <= 16
    # df really is N (it's in every doc)
    assert sum(r.n for r in hot) == N_DOCS


def test_wand_exact_under_skew(spark):
    idx = build_index_from(corpus(spark), text_col="text", cache=False)
    postings, meta = build_postings(
        idx, docs_per_shard=DOCS_PER_SHARD, block_span=16, n_buckets=8
    )
    wand = make_wand_topk(idx, postings, meta, block_span=16)
    for q in ("hotterm", "hotterm uniq_42", "everywhere_rare hotterm", "uniq_7 filler_3"):
        brute = [
            (r.rank, r.doc_id, round(r.score, 12)) for r in topk(idx, q, 10).collect()
        ]
        pruned = [
            (r.rank, r.doc_id, round(r.score, 12))
            for r in wand(q, 10, prune=True).collect()
        ]
        assert pruned == brute, q

"""End-to-end hybrid retrieval — the deterministic core of the
reference's main query path, ChainOfThoughtRetriever.search (reference
retriever.py:860-1029), minus the LLM loop (out of engine scope,
SURVEY.md W6 — its seams are final_selection's llm_confidence column and
accumulate_iterations):

  1. classify the query → (query_type, dense/sparse weights, confidence)
     (reference retriever.py:884 → query_classifier.py:161-203);
  2. sparse retrieval: global-index BM25 top-K (reference :363-415,
     minus the per-document-index defect);
  3. dense retrieval: cosine top-K over the embedding table
     (reference :312-361, FAISS flat ≡ exact brute force);
  4. weighted RRF fusion with the per-query-type fusion K
     (reference :417-483).

Spell correction (reference :884 → query_classifier.py:131-159) is
available upstream via operators/spell.correct_tokens against the index
vocabulary; temporal constraints wrap the result via fusion
.temporal_filter/temporal_decay (reference retriever.py:1070-1132).
"""

from __future__ import annotations

from ..functions.classify import analyze_query
from .fusion import FUSION_K, rrf_fuse
from .query import score_all
from .similarity import cosine_scores


def _ranked(scores, score_col: str, id_col: str, k: int):
    """round(6) → orderBy().limit(k) → rank. The limit is FIRST so Spark
    plans a TakeOrderedAndProject (per-partition k-heap + driver merge)
    over the unbounded scores domain; the single-partition row_number
    window then runs over ≤k rows, never over every matched doc."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    top = (
        scores.withColumn(score_col, F.round(score_col, 6))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col(id_col).alias("id"), "rank")
    )


def corrected_term_counts(index, query: str, max_d: int = 1) -> dict:
    """Spell-correct the query's token multiset against the index
    vocabulary (reference query_classifier.py:131-159 + the query
    replacement at retriever.py:886): every occurrence of a token maps
    through its best correction; unmatched tokens pass through."""
    from collections import Counter

    from ..functions.tokenize import tokenize_py
    from .spell import correct_tokens

    counts = Counter(tokenize_py(query))
    if not counts:
        return {}
    corr = correct_tokens(index.idf.select("term", "df"), sorted(counts), max_d=max_d)
    mapping = {r["token"]: r["corrected"] for r in corr.collect()}
    out: Counter = Counter()
    for t, c in counts.items():
        out[mapping.get(t, t)] += c
    return dict(out)


def search_corrected(index, query: str, k: int = 10, max_d: int = 1):
    """BM25 top-k over the spell-corrected query."""
    from .query import score_terms

    return score_terms(index, corrected_term_counts(index, query, max_d=max_d))


def hybrid_search(index, embeddings, query: str, query_vec, k: int = 10, sparse_fn=None):
    """→ (results DataFrame, QueryAnalysis). Results: (fused_rank, id,
    rank_d, rank_s, rrf_score) — the reference's SearchResult list shape
    with both per-ranker ranks exposed.

    sparse_fn: optional (query, n) -> DataFrame(doc_id, score) to swap
    the sparse ranker — pass a lambda over wand.make_wand_topk to run
    the hybrid lifecycle on the pruned compressed-postings path (the
    100 TB configuration) instead of brute-force score_all; n is sized
    k_fusion+32 so the rounded-rank cut at k_fusion is boundary-stable
    (same slack pattern as the bm25_wand gate)."""
    analysis = analyze_query(query)
    k_fusion = FUSION_K.get(analysis.query_type.value, FUSION_K["default"])
    w_dense = analysis.weights["dense"]
    w_sparse = analysis.weights["sparse"]

    raw_sparse = (
        sparse_fn(query, k_fusion + 32) if sparse_fn else score_all(index, query)
    )
    sparse = _ranked(raw_sparse, "score", "doc_id", k_fusion)
    from pyspark.sql import functions as F

    dense_scores = cosine_scores(embeddings, query_vec).filter(F.col("id") != 0)
    dense = _ranked(dense_scores, "cosine", "id", k_fusion)
    fused = rrf_fuse(
        dense, sparse, k_fusion=k_fusion, w_dense=w_dense, w_sparse=w_sparse, topk=k
    )
    return fused, analysis

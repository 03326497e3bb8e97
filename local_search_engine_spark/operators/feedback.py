"""Relevance feedback — implements the entry point the reference left
as a TODO stub (`search_with_feedback`, reference retriever.py:1134-1154
"TODO: Implement relevance feedback mechanism") with the standard
public algorithms:

  * dense leg: Rocchio query modification (Rocchio 1971; the SMART
    formulation) — q' = α·q + β·centroid(relevant) − γ·centroid(
    non-relevant). The feedback set is user-sized (a handful of judged
    docs), so collecting ONLY those vectors to the driver is bounded by
    the feedback, never the corpus.
  * sparse leg: pseudo/explicit query expansion — the top-m terms of
    the relevant docs by tf·idf (ties broken by term asc — the engine
    rule) join the query term multiset with weight 1 each.

Both modifications are deterministic, and feedback={} degenerates to
the unmodified hybrid search exactly (test-pinned).
"""

from __future__ import annotations


def rocchio_vector(
    query_vec,
    embeddings,
    feedback: dict,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[float]:
    """q' = α·q + β·mean(pos vecs) − γ·mean(neg vecs). feedback maps
    doc/vec id -> relevance (> 0 relevant, < 0 non-relevant; 0 ignored).
    Only the judged vectors are fetched (one filtered collect, bounded
    by |feedback|)."""
    from pyspark.sql import functions as F

    pos_ids = [int(i) for i, r in feedback.items() if r > 0]
    neg_ids = [int(i) for i, r in feedback.items() if r < 0]
    q = [float(x) for x in query_vec]
    if not pos_ids and not neg_ids:
        return q
    rows = {
        int(r["id"]): [float(x) for x in r["v"]]
        for r in embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        .filter(F.col(id_col).isin(pos_ids + neg_ids))
        .collect()
    }

    def centroid(ids):
        vecs = [rows[i] for i in ids if i in rows]
        if not vecs:
            return None
        return [sum(c) / len(vecs) for c in zip(*vecs)]

    out = [alpha * x for x in q]
    cp = centroid(pos_ids)
    if cp:
        out = [o + beta * c for o, c in zip(out, cp)]
    cn = centroid(neg_ids)
    if cn:
        out = [o - gamma * c for o, c in zip(out, cn)]
    return out


def expansion_terms(
    index, relevant_ids: list, top_m: int = 5, exclude: set | None = None
) -> list[str]:
    """Top-m expansion terms from the relevant docs by summed tf·idf
    (positive idf only — negative-idf terms would anti-score), ties by
    term ascending. One small aggregation over the tf rows of the
    judged docs."""
    from pyspark.sql import functions as F

    if not relevant_ids:
        return []
    scored = (
        index.tf.filter(F.col("doc_id").isin([int(i) for i in relevant_ids]))
        .join(index.idf.select("term", "idf"), "term")
        .filter(F.col("idf") > 0)
        .groupBy("term")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("w"))
    )
    if exclude:
        scored = scored.filter(~F.col("term").isin(sorted(exclude)))
    rows = scored.orderBy(F.desc("w"), F.asc("term")).limit(top_m).collect()
    return [r["term"] for r in rows]


def search_with_feedback(
    index,
    embeddings,
    query: str,
    query_vec,
    feedback: dict | None = None,
    k: int = 10,
    top_m_expansion: int = 3,
):
    """Hybrid search with Rocchio-modified dense query + term-expanded
    sparse query (reference TODO closed). feedback=None/{} returns the
    plain hybrid_search result exactly."""
    from collections import Counter

    from ..functions.tokenize import tokenize_py
    from .query import score_terms
    from .retrieval import hybrid_search

    feedback = feedback or {}
    if not feedback:
        return hybrid_search(index, embeddings, query, query_vec, k=k)
    qv = rocchio_vector(query_vec, embeddings, feedback)
    base_terms = Counter(tokenize_py(query))
    extra = expansion_terms(
        index,
        [i for i, r in feedback.items() if r > 0],
        top_m=top_m_expansion,
        exclude=set(base_terms),
    )
    expanded = dict(base_terms)
    for t in extra:
        expanded[t] = expanded.get(t, 0) + 1

    def sparse_fn(_query_text, _n):
        return score_terms(index, dict(sorted(expanded.items())))

    return hybrid_search(
        index, embeddings, query, qv, k=k, sparse_fn=sparse_fn
    )

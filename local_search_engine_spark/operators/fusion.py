"""Rank fusion and temporal scoring — the reference's hybrid-retrieval
surface re-expressed as DataFrame ops.

  * rrf_fuse: weighted Reciprocal Rank Fusion of two rankings
    (reference _merge_results, retriever.py:428-483: rank dicts at
    :448-449, weighted RRF w/(K+r) at :455-465, per-query-type K table
    at :417-426). The reference's dict union keyed on chunk_id is a
    full-outer join; absent ranks default to n+1 (retriever.py:450-453).
  * temporal_decay / temporal_filter: the reference's temporal scoring
    (strict filter retriever.py:1046-1052; exponential decay 0.95^days
    at :1044; flexible out-of-range 0.5*0.9^days_out at :1055-1061).

Both are pure built-in expressions over result DataFrames.
"""

from __future__ import annotations

# Per-query-type fusion K (reference retriever.py:417-426).
FUSION_K = {
    "factual": 40,
    "conceptual": 80,
    "procedural": 60,
    "exploratory": 100,
    "default": 50,
}


def rrf_fuse(dense, sparse, k_fusion: int = 50, w_dense: float = 0.5, w_sparse: float = 0.5, topk: int | None = None):
    """Weighted RRF over two (id, rank) DataFrames → (id, rrf_score).

    score(id) = w_d/(K + r_d) + w_s/(K + r_s), with r defaulting to
    (n_side + 1) when the id is missing from a side — exactly the
    reference's default rank len(results)+1 (retriever.py:450-453).
    Tie-break (score DESC, id ASC), pinned as everywhere in the engine.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_d = dense.count()
    n_s = sparse.count()
    d = dense.select(F.col("id"), F.col("rank").alias("rank_d"))
    s = sparse.select(F.col("id"), F.col("rank").alias("rank_s"))
    joined = d.join(s, "id", "full_outer").select(
        "id",
        F.coalesce("rank_d", F.lit(n_d + 1)).alias("rank_d"),
        F.coalesce("rank_s", F.lit(n_s + 1)).alias("rank_s"),
    )
    score = F.lit(w_dense) / (F.lit(k_fusion) + F.col("rank_d")) + F.lit(w_sparse) / (
        F.lit(k_fusion) + F.col("rank_s")
    )
    out = joined.withColumn("rrf_score", score)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    out = out.withColumn("fused_rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= topk)
    return out.select("fused_rank", "id", "rank_d", "rank_s", "rrf_score")


def temporal_filter(df, ts_col: str, start=None, end=None):
    """P7 strict temporal predicate (reference retriever.py:1046-1052) —
    a plain pushdown-able filter, not a join."""
    from pyspark.sql import functions as F

    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts_col) <= F.lit(end))
    return out


def temporal_decay(df, ts_col: str, now, score_col: str = "value", rate: float = 0.95):
    """F8 exponential recency decay (reference retriever.py:1044):
    decayed = score * rate^days_old, days_old = floor days between now
    and the row timestamp (negative ages clamp to 0)."""
    from pyspark.sql import functions as F

    days_old = F.greatest(F.datediff(F.lit(now), F.col(ts_col)), F.lit(0))
    return df.withColumn(
        "decayed", F.col(score_col) * F.pow(F.lit(rate), days_old.cast("double"))
    )

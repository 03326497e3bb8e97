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


def score_combine(dense, sparse, w_dense: float = 0.5, w_sparse: float = 0.5, topk: int | None = None):
    """J2/F10: normalized score-combination join (reference
    _combine_scores, retriever.py:684-717): each side's scores are
    max-normalized (score / max(score), reference :692-708), the sides
    are full-outer joined on id with 0.0 defaults for missing entries
    (:689), and blended w_d * nd + w_s * ns.

    Inputs: (id, score) DataFrames. The max is a scalar aggregate
    broadcast into the projection — no window shuffle. Non-positive or
    absent maxima leave that side's scores 0 (degenerate-corpus guard).
    Output: (combined_rank, id, norm_d, norm_s, combined) with the pinned
    (score DESC, id ASC) tie-break.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def norm_side(df, out_col):
        mx = df.agg(F.max("score")).first()[0]
        mx = float(mx) if mx is not None and mx > 0 else None
        col = (F.col("score") / F.lit(mx)) if mx else F.lit(0.0)
        return df.select(F.col("id"), col.alias(out_col))

    d = norm_side(dense, "norm_d")
    s = norm_side(sparse, "norm_s")
    joined = d.join(s, "id", "full_outer").select(
        "id",
        F.coalesce("norm_d", F.lit(0.0)).alias("norm_d"),
        F.coalesce("norm_s", F.lit(0.0)).alias("norm_s"),
    )
    out = joined.withColumn(
        "combined",
        F.lit(w_dense) * F.col("norm_d") + F.lit(w_sparse) * F.col("norm_s"),
    )
    w = Window.orderBy(F.desc("combined"), F.asc("id"))
    out = out.withColumn("combined_rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("combined_rank") <= topk)
    return out.select("combined_rank", "id", "norm_d", "norm_s", "combined")


def results_by_source(results, docs, group_cols=("lang", "source"), id_col: str = "doc_id"):
    """A9: group result rows by their source document attributes
    (reference ui.py:408-412 groups hits into Dict[source -> list]).

    results: (doc_id, score, ...) — joined to docs on doc_id (broadcast:
    the results side is top-k small), grouped by group_cols, hits packed
    as an ascending-(rank) csv with count + best score per group.
    """
    from pyspark.sql import functions as F

    joined = results.join(docs.select(id_col, *group_cols), id_col)
    return joined.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_hits"),
        F.max("score").alias("best_score"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", F.col(id_col).alias("id")))),
                lambda x: x["id"].cast("string"),
            ),
        ).alias("doc_ids_by_rank"),
    )


def accumulate_iterations(iteration_results):
    """J6/U2: merge result sets across retrieval iterations (reference
    retriever.py:978-994): the FIRST iteration that finds an id pins its
    result row; later iterations only append to iterations_found.

    iteration_results: list of (iteration:int, DataFrame(id, score)).
    Returns (id, score, first_iteration, iterations_csv, n_iterations) —
    score is the pinning (earliest) iteration's score; iterations_csv is
    the ascending list of iterations that found the id.
    """
    from functools import reduce

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tagged = [
        df.select(
            "id", "score", F.lit(int(it)).cast("int").alias("iteration")
        )
        for it, df in iteration_results
    ]
    all_rows = reduce(lambda a, b: a.unionByName(b), tagged)
    w = Window.partitionBy("id").orderBy("iteration")
    return (
        all_rows.withColumn("rn", F.row_number().over(w))
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("score"))).alias("score"),
            F.min("iteration").alias("first_iteration"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("iteration")),
                    lambda x: x.cast("string"),
                ),
            ).alias("iterations_csv"),
            F.count("*").cast("long").alias("n_iterations"),
        )
    )


def final_selection(metrics, n_iterations: int, top_k: int = 5):
    """A7/T5: the reference's final-selection blend (reference
    retriever.py:793-849):

      objective  = 0.3·retrieval + 0.2·semantic + 0.2·quality + 0.1·keyword
      subjective = 0.1·llm_confidence + 0.1·(iterations_found / n_iterations)
      total      = objective + subjective,  top_k by total DESC

    metrics: DataFrame(id, retrieval_score, semantic_relevance,
    text_quality, keyword_match, llm_confidence, n_iterations_found).
    Null retrieval/llm default to 0.5 (reference :810-818); other null
    metrics default to 0. llm_confidence is whatever the caller supplies
    — the LLM itself is out of engine scope (SURVEY.md W6), the seam
    takes a column. Tie-break (total DESC, id ASC), pinned.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = F.coalesce("retrieval_score", F.lit(0.5))
    llm = F.coalesce("llm_confidence", F.lit(0.5))
    sem = F.coalesce("semantic_relevance", F.lit(0.0))
    q = F.coalesce("text_quality", F.lit(0.0))
    kw = F.coalesce("keyword_match", F.lit(0.0))
    cons = F.coalesce("n_iterations_found", F.lit(0)).cast("double") / F.lit(
        float(n_iterations)
    )
    obj = 0.3 * r + 0.2 * sem + 0.2 * q + 0.1 * kw
    subj = 0.1 * llm + 0.1 * cons
    out = metrics.select(
        "id",
        obj.alias("objective_score"),
        subj.alias("subjective_score"),
        (obj + subj).alias("total_score"),
    )
    w = Window.orderBy(F.desc("total_score"), F.asc("id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("rank", "id", "total_score", "objective_score", "subjective_score")
    )


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

"""Search-result aggregations (Elasticsearch aggs over a query's match
set): terms facets, per-group numeric stats, fixed-width numeric
histograms.

The reference has no aggregation layer (its UI lists flat results —
`/root/reference/ui.py:540-600` renders top-k rows only); this module is
an engine EXTENSION modeled on the Elasticsearch `aggregations` request
body, the layer every search UI grows next: "filter by language",
"result counts per repo", "size distribution of the hits".

Every aggregation runs over the FULL boolean match set (boolquery.matches,
uncapped — aggregations describe the result space, not the top-k page):

    survivors(doc_id)  ⋈  index.docs(doc_id, <needed cols>)  →  groupBy

Scale shape: the join is a doc_id equi-join (AQE/sort-merge; survivors
never collect to the driver), the groupBy is a partial-aggregated
(map-side combine) shuffle on the group key, and the docs scan is
column-pruned to exactly the facet/stat columns. facet_topn is
limit-BEFORE-rank: orderBy().limit(n) plans as TakeOrderedAndProject, a
distributed n-heap — the full group domain never sorts. At 100 TB the
whole plan is: postings-driven survivor set (O(postings of the query's
leaves)) + one metadata join + one combine-reduced shuffle whose width
is the group-key cardinality, not the corpus.
"""

from __future__ import annotations

__all__ = ["facet_topn", "group_stats", "numeric_histogram"]


def _survivor_docs(index, query, cols, phrase_query=None, regex_query=None):
    """Boolean survivors joined to the column-pruned docs metadata."""
    from .boolquery import matches

    missing = [c for c in cols if c not in index.docs.columns]
    if missing:
        raise ValueError(
            f"unknown column(s) {missing} — index.docs has: "
            f"{sorted(index.docs.columns)}"
        )
    surv = matches(
        index, query, phrase_query=phrase_query, regex_query=regex_query
    ).select("doc_id")
    return surv.join(index.docs.select("doc_id", *cols), "doc_id")


def facet_topn(index, query, col, n=10, phrase_query=None, regex_query=None):
    """Terms facet (Elasticsearch `terms` agg): the n most frequent
    values of a docs metadata column across the query's match set.

    Returns DataFrame(value string, n_docs long) in the deterministic
    facet order (n_docs DESC, value ASC). NULL metadata values group
    under the literal '(missing)' bucket, as Elasticsearch's `missing`
    parameter does."""
    from pyspark.sql import functions as F

    joined = _survivor_docs(index, query, [col], phrase_query, regex_query)
    grouped = (
        joined.select(
            F.coalesce(F.col(col).cast("string"), F.lit("(missing)")).alias("value")
        )
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return grouped.orderBy(F.desc("n_docs"), F.asc("value")).limit(n)


def group_stats(index, query, group_col, stat_col,
                phrase_query=None, regex_query=None):
    """Per-group numeric stats (Elasticsearch `terms` agg with a `stats`
    sub-aggregation): count/min/max/avg/sum of `stat_col` per value of
    `group_col`, over the query's match set.

    Returns DataFrame(group string, n_docs long, min double, max double,
    avg double, sum double) — one partial-aggregated shuffle; all five
    metrics ride the same combiner. avg is NULL for all-NULL groups,
    matching SQL semantics on both engines."""
    from pyspark.sql import functions as F

    joined = _survivor_docs(
        index, query, [group_col, stat_col], phrase_query, regex_query
    )
    sc = F.col(stat_col).cast("double")
    return (
        joined.select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("(missing)")).alias(
                "group"
            ),
            sc.alias("_v"),
        )
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_v").alias("min"),
            F.max("_v").alias("max"),
            F.avg("_v").alias("avg"),
            F.sum("_v").alias("sum"),
        )
    )


def numeric_histogram(index, query, col, width,
                      phrase_query=None, regex_query=None):
    """Fixed-interval numeric histogram (Elasticsearch `histogram` agg):
    bucket = floor(col / width) * width over the query's match set.
    Empty buckets are omitted (min_doc_count=1 semantics — emitting
    empties would require a driver-side range, not a data pass).

    Returns DataFrame(bin_start double, n_docs long). NULL values are
    dropped, as Elasticsearch does without a `missing` parameter."""
    from pyspark.sql import functions as F

    if not (isinstance(width, (int, float)) and width > 0):
        raise ValueError(f"width must be a positive number, got {width!r}")
    joined = _survivor_docs(index, query, [col], phrase_query, regex_query)
    v = F.col(col).cast("double")
    return (
        joined.filter(v.isNotNull())
        .select((F.floor(v / width) * width).cast("double").alias("bin_start"))
        .groupBy("bin_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )

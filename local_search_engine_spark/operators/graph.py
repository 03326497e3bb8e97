"""Graph operators for code corpora: import extraction and PageRank —
the dependency-graph doc prior (a file imported by many files is a
better search result than the fifty files importing it; public
algorithm: Brin & Page 1998).

Spark-first shape:
  * extract_imports is a zero-shuffle row-wise JVM regex projection
    (like symbols.py / scrub.py);
  * pagerank is power iteration where each round is ONE join + ONE
    aggregation over the edge relation, with dangling mass folded in
    via a 1-row scalar (no node ever fans out driver-side) and ranks
    localCheckpoint()ed per round — constant lineage, the same
    iterative-algorithm discipline as dedup.connected_components;
  * edges are reusable for any (src, dst) relation — imports, calls,
    co-change — the operator does not care where the graph came from.
"""

from __future__ import annotations

IMPORT_PATTERNS: dict[str, list[str]] = {
    "python": [
        r"(?m)^[ \t]*import[ \t]+([A-Za-z_][A-Za-z0-9_.]*)",
        r"(?m)^[ \t]*from[ \t]+([A-Za-z_][A-Za-z0-9_.]*)[ \t]+import",
    ],
    "javascript": [
        r"""(?m)^[ \t]*import[^'"\n]*['"]([^'"\n]+)['"]""",
        r"""require\(['"]([^'"\n]+)['"]\)""",
    ],
    "go": [r"""(?m)^[ \t]*(?:import[ \t]+)?['"]([A-Za-z0-9_./-]+)['"]"""],
    "rust": [r"(?m)^[ \t]*use[ \t]+([A-Za-z_][A-Za-z0-9_:]*)"],
}
DEFAULT_IMPORT_LANG = "python"


def extract_imports(docs, text_col: str = "content", lang_col: str = "lang", id_col: str = "doc_id"):
    """(doc_id, module): every distinct imported module per doc —
    row-wise JVM regex, per-language patterns via a chained CASE."""
    from pyspark.sql import functions as F

    lang = (
        F.lower(F.col(lang_col))
        if lang_col in docs.columns
        else F.lit(DEFAULT_IMPORT_LANG)
    )
    per_lang = {
        lg: F.array_distinct(
            F.flatten(
                F.array(
                    *[
                        F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(1))
                        for p in pats
                    ]
                )
            )
        )
        for lg, pats in IMPORT_PATTERNS.items()
    }
    case = None
    for lg, arr in per_lang.items():
        case = F.when(lang == lg, arr) if case is None else case.when(lang == lg, arr)
    case = case.otherwise(per_lang[DEFAULT_IMPORT_LANG])
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(case).alias("module")
    )


def pagerank(edges, damping: float = 0.85, max_iter: int = 30, tol: float = 1e-6):
    """(node, rank) over a directed (src, dst) edge relation; ranks sum
    to 1. Power iteration: rank' = (1−d)/N + d·(Σ in-contribs +
    dangling_mass/N); converges when max |Δrank| < tol (raises past
    max_iter — never a silently unconverged result). Each round: one
    join edges⋈ranks on src (out-degree pre-joined once), one
    groupBy(dst).sum, one scalar dangling aggregate."""
    from pyspark.sql import functions as F

    e = edges.select(F.col("src"), F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = e.join(out_deg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "node")
            .agg(F.max(F.abs(F.col("rank") - F.col("old"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta < tol:
            return ranks
    raise RuntimeError(f"pagerank did not converge in {max_iter} rounds (Δ={delta})")

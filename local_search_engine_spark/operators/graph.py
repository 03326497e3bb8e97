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


def pagerank(
    edges,
    damping: float = 0.85,
    max_iter: int = 30,
    tol: float = 1e-6,
    exact_iters: int | None = None,
):
    """(node, rank) over a directed (src, dst) edge relation; ranks sum
    to 1. Power iteration: rank' = (1−d)/N + d·(Σ in-contribs +
    dangling_mass/N); converges when max |Δrank| < tol (raises past
    max_iter — never a silently unconverged result).

    ONE Spark action per round: new ranks are built from the previous
    barrier + a DRIVER-SCALAR dangling mass, lazily localCheckpointed,
    and a single post-checkpoint aggregate — materializing the
    checkpoint as it runs — returns BOTH the convergence Δ and the next
    round's dangling mass (Σ rank over out-degree-0 nodes of the NEW
    ranks). The r03 shape ran three actions per round. Dangling
    membership is STATIC, so it is resolved ONCE before the loop into a
    boolean column on the node table and rides through every round's
    rank projection — the per-round aggregate is a plain scan of the
    fresh barrier in exact_iters mode (no join at all: one fewer
    node-table shuffle per round than the first one-action shape, which
    re-joined the static no-out set every iteration).

    INVARIANT (load-bearing, do not "simplify" away): the plan feeding
    each round's checkpoint references the previous checkpoint barrier
    EXACTLY ONCE (in the contribs join). Spark's localCheckpoint
    propagates origin sizeInBytes statistics through the barrier, and
    Catalyst's join-stats visitor multiplies child sizes — so k
    references per round compound the stat value like S^k per round.
    An earlier one-action shape that crossJoined an in-plan dangling
    aggregate and carried the old rank through the barrier referenced
    it 3×/round: stats digits tripled per round, planning went
    super-exponential past ~15 rounds and Spark finally threw
    "BigInteger would overflow supported range" (~round 25). With one
    reference the stat grows by a constant factor per round — flat
    planning cost at 200+ rounds (measured both ways).

    exact_iters: run exactly that many rounds with no convergence test
    (same one-action rounds) — the reproducible-fixed-point mode the
    driver gate's unrolled-SQL oracle matches against."""
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
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    e_deg = e.join(out_deg, "src").localCheckpoint()
    # static dangling flag, resolved once: rides through every round's
    # projection so the per-round aggregate never joins
    nodes_f = (
        nodes.join(
            out_deg.select(F.col("src").alias("node"), F.lit(1).alias("_has")),
            "node",
            "left",
        )
        .select("node", F.col("_has").isNull().alias("_dangling"))
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    rounds = max_iter if exact_iters is None else exact_iters
    # initial dangling mass: one pre-loop aggregate over the uniform
    # ranks (a float SUM, mirroring the oracle's per-round formulation
    # bit for bit rather than (n_dangling/n)·(1/n) driver arithmetic)
    dang = (
        ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
        .first()[0]
    )
    delta = None
    for _ in range(rounds):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            nodes_f.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dang) / F.lit(float(n))
                    )
                ).alias("rank"),
                "_dangling",
            )
            .localCheckpoint(eager=False)
        )
        # the round's ONE action: materializes the lazy checkpoint and
        # returns the next round's dangling mass — plus, in convergence
        # mode, the Δ against the previous barrier in the same aggregate.
        # exact_iters mode is a JOIN-FREE scan-agg of the fresh barrier.
        dang_col = F.coalesce(
            F.sum(F.when(F.col("_dangling"), F.col("rank"))), F.lit(0.0)
        ).alias("_dang")
        if exact_iters is None:
            row = (
                new_ranks.join(
                    ranks.select("node", F.col("rank").alias("_old")), "node"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("_old"))).alias("_delta"), dang_col)
                .first()
            )
            delta, dang = row["_delta"], row["_dang"]
        else:
            dang = new_ranks.agg(dang_col).first()["_dang"]
        ranks = new_ranks
        if exact_iters is None and delta < tol:
            return ranks.select("node", "rank")
    if exact_iters is not None:
        return ranks.select("node", "rank")
    raise RuntimeError(f"pagerank did not converge in {max_iter} rounds (Δ={delta})")

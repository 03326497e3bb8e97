"""Co-change analysis: files that change together (share commits) —
the commit-graph relatedness signal code search uses for "related
files" and for dependency-free impact analysis. Public technique
(logical-coupling mining, e.g. Gall et al. 1998-era work); the input
is exactly the corpus table's (repo, path, commit) columns.

Spark-first shape: group paths by (repo, commit) → per-commit path
arrays IN-ROW → all i<j pairs generated inside the array
(dedup.bucket_pairs — zero extra shuffle vs an explode-twice
self-join) → weight = number of shared commits per pair. Giant
commits (repo-wide reformat touching thousands of files) would emit
quadratic pairs; they are CAPPED and the drop is OBSERVED via the
returned metrics (same no-silent-truncation contract as the LSH
bucket caps): a commit touching more than max_commit_files files is
treated as noise (mass refactors carry no coupling signal — standard
practice in the coupling-mining literature) and counted, never
silently lost.
"""

from __future__ import annotations

DEFAULT_MAX_COMMIT_FILES = 64


def co_change_edges(
    corpus,
    max_commit_files: int = DEFAULT_MAX_COMMIT_FILES,
    min_weight: int = 1,
    metrics: dict | None = None,
):
    """(a, b, weight): undirected path pairs (a < b, within a repo)
    weighted by the number of commits that touched both. Input needs
    (repo, path, commit) columns; a/b are 'repo:path' strings."""
    from pyspark.sql import functions as F

    per_commit = (
        corpus.select(
            F.concat_ws(":", F.col("repo"), F.col("path")).alias("file"),
            "repo",
            "commit",
        )
        .groupBy("repo", "commit")
        .agg(F.collect_set("file").alias("ids"))
        .withColumn("n_files", F.size("ids"))
    )
    if metrics is not None:
        from pyspark.sql import Observation

        obs = Observation("co_change")
        per_commit = per_commit.observe(
            obs,
            F.count(F.lit(1)).alias("n_commits"),
            F.sum(
                F.when(F.col("n_files") > max_commit_files, 1).otherwise(0)
            ).alias("dropped_commits"),
            F.max("n_files").alias("max_commit_files_seen"),
        )
        metrics["observation"] = obs
    kept = per_commit.filter(F.col("n_files") <= max_commit_files)
    # same in-array i<j expansion as dedup.bucket_pairs, but WITHOUT its
    # global distinct — weight needs per-commit multiplicity
    ids_s = F.array_sort(F.col("ids"))
    expanded = F.flatten(
        F.transform(
            ids_s,
            lambda x, i: F.transform(
                F.slice(ids_s, i + 2, F.size(ids_s)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    edges = (
        kept.select(F.explode(expanded).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )
    return edges


def related_files(edges, file: str, k: int = 10):
    """Top-k files most coupled to `file` by co-change weight — the
    'related files' panel. Filter pushes to the edge relation; ties
    break by name ascending (engine rule)."""
    from pyspark.sql import functions as F

    touching = edges.filter(
        (F.col("a") == file) | (F.col("b") == file)
    ).select(
        F.when(F.col("a") == file, F.col("b")).otherwise(F.col("a")).alias("other"),
        "weight",
    )
    return touching.orderBy(F.desc("weight"), F.asc("other")).limit(k)

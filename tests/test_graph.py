"""Graph operators: import extraction and PageRank (vs a pure-python
power-iteration twin on the same graph)."""

from __future__ import annotations

import pytest

from local_search_engine_spark.operators.graph import extract_imports, pagerank


def _pagerank_py(edges, n_nodes, damping=0.85, iters=200):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in ranks.items() if v not in out)
        new = {v: (1 - damping) / len(nodes) + damping * dangling / len(nodes) for v in nodes}
        for s, d in edges:
            new[d] += damping * ranks[s] / out[s]
        ranks = new
    return ranks


GRAPH = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 is dangling-in, 3 is the hub


def test_pagerank_matches_python_twin(spark):
    e = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, tol=1e-7, max_iter=80).collect()
    }
    want = _pagerank_py(GRAPH, 4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-5, v
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # the hub outranks everything; the pure-sink contributor ranks last
    order = sorted(got, key=got.get, reverse=True)
    assert order[0] == 3 and order[-1] == 4


def test_pagerank_edge_cases(spark):
    # all-dangling graph (one edge into a sink): still sums to 1
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, tol=1e-8, max_iter=80).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-7
    assert got[2] > got[1]
    with pytest.raises(RuntimeError):
        pagerank(spark.createDataFrame(GRAPH, "src long, dst long"), max_iter=1, tol=0.0)


def test_extract_imports_per_language(spark):
    rows = [
        (0, "python", "import os\nfrom collections import Counter\nimport numpy.linalg\nx = 'import fake'"),
        (1, "javascript", "import {a} from './shard'\nconst b = require('fs')"),
        (2, "rust", "use std::collections;\nfn main() {}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, content string")
    got = {(r["doc_id"], r["module"]) for r in extract_imports(docs).collect()}
    assert (0, "os") in got and (0, "collections") in got
    assert (0, "numpy.linalg") in got
    assert (0, "fake") not in got  # string literal, not a statement head
    assert (1, "./shard") in got and (1, "fs") in got
    assert (2, "std::collections") in got


def _jobs_during(spark, group: str, fn):
    """Run fn() under a job group; return the job ids it fired. AQE is
    toggled OFF around fn so job counts reflect ACTIONS (AQE submits one
    job per adaptive query stage, which would make the count a moving
    target)."""
    sc = spark.sparkContext
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "action probe")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return list(sc.statusTracker().getJobIdsForGroup(group))


def test_pagerank_exact_iters_matches_python_twin(spark):
    e = spark.createDataFrame(GRAPH, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(e, exact_iters=200).collect()
    }
    want = _pagerank_py(GRAPH, 4, iters=200)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_pagerank_one_job_per_iteration(spark):
    """r04: each round is ONE action — the combined (Δ, dangling-mass)
    aggregate whose .first() also materializes the round's lazy
    localCheckpoint — and with AQE off that action is exactly ONE job.
    The r03 shape ran three actions per round. (The round's plan must
    also reference the previous checkpoint barrier exactly once — see
    the stats-compounding invariant in pagerank's docstring — which
    this probe would catch as runaway per-round wall time.)"""
    e = spark.createDataFrame(GRAPH, "src long, dst long")
    j3 = _jobs_during(spark, "pr-iter-3", lambda: pagerank(e, exact_iters=3))
    j6 = _jobs_during(spark, "pr-iter-6", lambda: pagerank(e, exact_iters=6))
    assert len(j6) - len(j3) == 3 * 1

"""Co-change mining: weighted logical-coupling edges from (repo, path,
commit), giant-commit capping with observed drops, and related-files
lookup."""

from __future__ import annotations

from local_search_engine_spark.operators.cochange import (
    co_change_edges,
    related_files,
)

ROWS = [
    # commit c1 touches a,b,c ; c2 touches a,b ; c3 touches b,c ; c4 only d
    ("r1", "a.py", "c1"), ("r1", "b.py", "c1"), ("r1", "c.py", "c1"),
    ("r1", "a.py", "c2"), ("r1", "b.py", "c2"),
    ("r1", "b.py", "c3"), ("r1", "c.py", "c3"),
    ("r1", "d.py", "c4"),
    # a second repo with its own commit ids — never couples across repos
    ("r2", "x.py", "c1"), ("r2", "y.py", "c1"),
]


def _corpus(spark, rows=None):
    return spark.createDataFrame(rows or ROWS, "repo string, path string, commit string")


def test_cochange_weights(spark):
    edges = {
        (r["a"], r["b"]): r["weight"]
        for r in co_change_edges(_corpus(spark)).collect()
    }
    assert edges[("r1:a.py", "r1:b.py")] == 2      # c1 + c2
    assert edges[("r1:a.py", "r1:c.py")] == 1      # c1
    assert edges[("r1:b.py", "r1:c.py")] == 2      # c1 + c3
    assert edges[("r2:x.py", "r2:y.py")] == 1
    assert not any("d.py" in a or "d.py" in b for a, b in edges)  # lone file
    assert not any(a.startswith("r1") != b.startswith("r1") for a, b in edges)


def test_cochange_min_weight_and_giant_commit_cap(spark):
    rows = list(ROWS) + [("r1", f"gen_{i}.py", "mega") for i in range(80)]
    m: dict = {}
    edges_df = co_change_edges(
        _corpus(spark, rows), max_commit_files=64, min_weight=2, metrics=m
    )
    edges = {(r["a"], r["b"]): r["weight"] for r in edges_df.collect()}
    # the 80-file mega commit is dropped: no gen_ pair survives, and no
    # quadratic blowup happened
    assert edges == {("r1:a.py", "r1:b.py"): 2, ("r1:b.py", "r1:c.py"): 2}
    got = m["observation"].get
    assert got["dropped_commits"] == 1
    assert got["max_commit_files_seen"] == 80
    assert got["n_commits"] == 6  # c1..c4 in r1, mega, c1 in r2


def test_related_files_lookup(spark):
    edges = co_change_edges(_corpus(spark))
    rel = [
        (r["other"], r["weight"])
        for r in related_files(edges, "r1:b.py", k=5).collect()
    ]
    # both neighbours at weight 2; tie broken by name ascending
    assert rel == [("r1:a.py", 2), ("r1:c.py", 2)]
    assert related_files(edges, "r1:d.py", k=5).count() == 0

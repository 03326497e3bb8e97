"""Best-snippet selection: dense-window kernel properties and the
Spark mapInPandas wrapper."""

from __future__ import annotations

from local_search_engine_spark.operators.snippets import (
    best_snippets,
    best_window_py,
)


def test_best_window_kernel():
    text = "zzz merge zzz " + "pad " * 60 + "merge join merge join end"
    start, hits = best_window_py(text, {"merge", "join"}, width=40)
    # the dense cluster near the end beats the lone early hit
    assert hits == 4
    assert text[start : start + 40].startswith("merge join merge join")
    # tie-break: equal-density windows pick the earliest start
    t2 = "merge pad pad pad merge"
    s2, h2 = best_window_py(t2, {"merge"}, width=6)
    assert (s2, h2) == (0, 1)
    # whole-token matching only: 'merged' is not a hit for 'merge'
    assert best_window_py("merged merges", {"merge"}, width=50) == (0, 0)
    # case-insensitive; empty/missing-term cases
    assert best_window_py("Merge HERE", {"merge"}, width=50) == (0, 1)
    assert best_window_py("", {"merge"}) == (0, 0)
    assert best_window_py("no terms here", set()) == (0, 0)


def test_best_window_covers_all_when_width_large():
    text = "a merge b join c merge d"
    start, hits = best_window_py(text, {"merge", "join"}, width=10_000)
    assert hits == 3 and start == text.index("merge")


def test_best_snippets_spark(spark):
    rows = [
        (0, "zzz merge zzz " + "pad " * 60 + "merge join merge join end"),
        (1, "nothing relevant at all"),
        (2, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in best_snippets(docs, ["merge", "join"], width=40).collect()
    }
    assert got[0]["n_hits"] == 4
    assert got[0]["snippet"].startswith("merge join merge join")
    assert got[0]["snippet"] == rows[0][1][
        got[0]["snippet_start"] : got[0]["snippet_start"] + 40
    ]
    assert got[1]["n_hits"] == 0 and got[2]["n_hits"] == 0
    plan = (
        best_snippets(docs, ["merge"], width=40)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan

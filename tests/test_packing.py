"""Sequence packing: partition invariants (exactly-once docs, budget
cap, oversized flagging), determinism, and fill behavior."""

from __future__ import annotations

import pytest

from local_search_engine_spark.operators.packing import pack_sequences


def _collect(spark, rows, budget, partitions=2):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return pack_sequences(df, budget, partitions=partitions).collect()


def test_pack_invariants(spark):
    rows = [(i, 10 + (i * 7) % 50) for i in range(100)]
    budget = 128
    seqs = _collect(spark, rows, budget, partitions=4)
    seen: list[int] = []
    for s in seqs:
        assert s["n_docs"] == len(s["doc_ids"])
        assert s["seq_id"] == s["doc_ids"][0]
        assert s["doc_ids"] == sorted(s["doc_ids"])
        if not s["needs_split"]:
            assert s["total_tokens"] <= budget
        expect = sum(t for d, t in rows if d in set(s["doc_ids"]))
        assert s["total_tokens"] == expect
        seen.extend(s["doc_ids"])
    assert sorted(seen) == [d for d, _ in rows]  # exactly once, all docs
    # packing actually packs: mean fill well above a doc-per-sequence
    fills = [s["total_tokens"] / budget for s in seqs if not s["needs_split"]]
    assert sum(fills) / len(fills) > 0.6


def test_pack_oversized_doc_flagged_not_truncated(spark):
    rows = [(1, 50), (2, 500), (3, 40)]
    seqs = {s["seq_id"]: s for s in _collect(spark, rows, 100, partitions=1)}
    big = next(s for s in seqs.values() if 2 in s["doc_ids"])
    assert big["needs_split"] and big["n_docs"] == 1 and big["total_tokens"] == 500
    assert not any(s["needs_split"] for s in seqs.values() if 2 not in s["doc_ids"])


def test_pack_deterministic_for_fixed_partitions(spark):
    rows = [(i, 5 + i % 90) for i in range(200)]
    a = sorted(tuple(r) for r in _collect(spark, rows, 256, partitions=3))
    b = sorted(tuple(r) for r in _collect(spark, rows, 256, partitions=3))
    assert a == b


def test_pack_bad_budget_raises(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_plan_single_range_shuffle(spark):
    """One range Exchange feeds the Arrow pack — no second shuffle, no
    window, no sort beyond the within-partition one."""
    df = spark.createDataFrame(
        [(i, 10) for i in range(50)], "doc_id long, n_tokens long"
    )
    plan = (
        pack_sequences(df, 64, partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan, plan
    assert "Window" not in plan, plan

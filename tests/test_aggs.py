"""Aggregations over boolean match sets (operators/aggs.py): facet
counts, per-group stats, and numeric histograms each equal a per-doc
Python recomputation over the same corpus (independent twin), with the
Elasticsearch edge semantics pinned (missing bucket, NULL drops,
deterministic facet order, limit-before-rank top-n)."""

from __future__ import annotations

import math
import random

import pytest

from local_search_engine_spark.functions.tokenize import tokenize_py
from local_search_engine_spark.operators.aggs import (
    facet_topn,
    group_stats,
    numeric_histogram,
)
from local_search_engine_spark.operators.boolquery import matches
from local_search_engine_spark.operators.build import build_index_from

VOCAB = ["table", "scan", "agg", "row", "fast", "slow", "io"]
LANGS = ["en", "de", "fr", None]


def _gen_rows(n_docs: int, seed: int = 29):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(0, 20))]
        text = " ".join(words)
        n_chars = None if i % 17 == 0 else len(text)
        rows.append((i, text, LANGS[i % 4], n_chars))
    return rows


@pytest.fixture(scope="module")
def setup(spark):
    rows = _gen_rows(120)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).repartition(8)
    return rows, build_index_from(df, text_col="text")


def _match_rows(rows, query_terms_pred):
    out = []
    for doc_id, text, lang, n_chars in rows:
        if query_terms_pred(set(tokenize_py(text))):
            out.append((doc_id, lang, n_chars))
    return out


QUERY = "table AND NOT slow"
PRED = lambda toks: "table" in toks and "slow" not in toks  # noqa: E731


def test_facet_topn(setup):
    rows, idx = setup
    got = [(r["value"], r["n_docs"]) for r in facet_topn(idx, QUERY, "lang", 10).collect()]
    from collections import Counter

    c = Counter(
        lang if lang is not None else "(missing)"
        for _, lang, _ in _match_rows(rows, PRED)
    )
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    # top-n actually cuts, preserving the deterministic order prefix
    got2 = [(r["value"], r["n_docs"]) for r in facet_topn(idx, QUERY, "lang", 2).collect()]
    assert got2 == want[:2]


def test_facet_is_limit_before_rank(setup):
    _, idx = setup
    plan = facet_topn(idx, QUERY, "lang", 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_group_stats(setup):
    rows, idx = setup
    got = {
        r["group"]: (r["n_docs"], r["min"], r["max"], r["avg"], r["sum"])
        for r in group_stats(idx, QUERY, "lang", "n_chars").collect()
    }
    groups: dict = {}
    for _, lang, n_chars in _match_rows(rows, PRED):
        groups.setdefault(lang if lang is not None else "(missing)", []).append(n_chars)
    for g, vals in groups.items():
        n = len(vals)
        nn = [v for v in vals if v is not None]
        gn, gmin, gmax, gavg, gsum = got[g]
        assert gn == n
        if nn:
            assert gmin == min(nn) and gmax == max(nn)
            assert math.isclose(gavg, sum(nn) / len(nn), rel_tol=1e-12)
            assert gsum == sum(nn)
        else:
            assert gmin is None and gmax is None and gavg is None and gsum is None
    assert set(got) == set(groups)


def test_numeric_histogram(setup):
    rows, idx = setup
    width = 25
    got = {r["bin_start"]: r["n_docs"] for r in numeric_histogram(idx, QUERY, "n_chars", width).collect()}
    from collections import Counter

    want = Counter(
        float(math.floor(n_chars / width) * width)
        for _, _, n_chars in _match_rows(rows, PRED)
        if n_chars is not None  # NULLs drop (no `missing` param)
    )
    assert got == dict(want)
    with pytest.raises(ValueError, match="positive"):
        numeric_histogram(idx, QUERY, "n_chars", 0)


def test_unknown_column_raises(setup):
    _, idx = setup
    with pytest.raises(ValueError, match="unknown column"):
        facet_topn(idx, QUERY, "nosuchcol", 5)


def test_empty_match_set(setup):
    _, idx = setup
    assert facet_topn(idx, "zzzznotaterm", "lang", 5).count() == 0
    assert group_stats(idx, "zzzznotaterm", "lang", "n_chars").count() == 0
    assert numeric_histogram(idx, "zzzznotaterm", "n_chars", 10).count() == 0


def test_aggs_over_nonrestrictive_query(setup):
    """A NOT-dominated query ranges over the whole universe — the agg
    totals must equal the corpus size."""
    rows, idx = setup
    total = sum(
        r["n_docs"] for r in facet_topn(idx, "NOT zzzznotaterm", "lang", 10).collect()
    )
    assert total == len(rows)
    assert total == matches(idx, "NOT zzzznotaterm").count()

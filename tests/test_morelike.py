"""More-like-this (operators/morelike.py) vs a pure-Python twin built
on the rank-identity BM25Oracle: term selection (tf·idf top-M with the
noise gates) and the final ranking (source doc excluded, rounded-rank
rule) must both match; edge cases (empty doc, unknown doc) pinned."""

from __future__ import annotations

import pytest

from local_search_engine_spark.operators.build import build_index
from local_search_engine_spark.operators.morelike import (
    interesting_terms,
    more_like_this,
)
from local_search_engine_spark.sources import gen_corpus_spark

from .oracle import oracle_for_corpus

N_DOCS = 150


@pytest.fixture(scope="module")
def setup(spark):
    idx = build_index(gen_corpus_spark(spark, N_DOCS, partitions=8))
    return idx, oracle_for_corpus(N_DOCS)


def _oracle_mlt(oracle, doc_id, max_terms, min_tf, min_df, k):
    cand = [
        (t, tf)
        for t, tf in oracle.tf[doc_id].items()
        if tf >= min_tf and oracle.df[t] >= min_df
    ]
    sel = sorted(
        ((t, tf, oracle.df[t], tf * oracle.idf[t]) for t, tf in cand),
        key=lambda x: (-x[3], x[0]),
    )[:max_terms]
    qterms = [t for t, _, _, _ in sel]
    scored = []
    for d in range(oracle.n_docs):
        if d == doc_id or not any(oracle.tf[d].get(t, 0) for t in qterms):
            continue
        scored.append((d, round(oracle.score(qterms, d), 6)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return sel, [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]


@pytest.mark.parametrize(
    "doc_id,max_terms,min_tf,min_df",
    [
        (7, 25, 1, 1),
        (42, 8, 1, 1),  # tight term budget: selection cut matters
        (3, 25, 2, 1),  # min_term_freq gate
        (11, 25, 1, 3),  # min_doc_freq gate
    ],
)
def test_mlt_matches_oracle(setup, doc_id, max_terms, min_tf, min_df):
    idx, oracle = setup
    want_sel, want_top = _oracle_mlt(oracle, doc_id, max_terms, min_tf, min_df, 10)
    got_sel = interesting_terms(
        idx, doc_id, max_query_terms=max_terms,
        min_term_freq=min_tf, min_doc_freq=min_df,
    )
    assert [(t, tf, df) for t, tf, df, _ in got_sel] == [
        (t, tf, df) for t, tf, df, _ in want_sel
    ]
    for (_, _, _, gw), (_, _, _, ww) in zip(got_sel, want_sel):
        assert abs(gw - ww) < 1e-9
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in more_like_this(
            idx, doc_id, 10, max_query_terms=max_terms,
            min_term_freq=min_tf, min_doc_freq=min_df,
        ).collect()
    ]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want_top]
    for (_, _, gs), (_, _, ws) in zip(got, want_top):
        assert abs(gs - ws) < 1e-6


def test_mlt_excludes_source(setup):
    idx, _ = setup
    assert more_like_this(idx, 7, 50).filter("doc_id = 7").count() == 0


def test_mlt_unknown_doc_raises(setup):
    idx, _ = setup
    with pytest.raises(ValueError, match="not in the index"):
        more_like_this(idx, 10**9, 5)


def test_mlt_impossible_gates_empty(setup):
    """Gates no term can pass -> empty result, not an error."""
    idx, _ = setup
    out = more_like_this(idx, 7, 5, min_term_freq=10**6)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "doc_id", "score"]

"""Spell correction (SURVEY.md F16): the deletion-hash candidate join
must return exactly the brute-force minimum-levenshtein correction."""

import pytest

from local_search_engine_spark.operators.spell import correct_tokens, delete_variants_py

VOCAB = [
    ("table", 40),
    ("tables", 12),
    ("merge", 30),
    ("merges", 5),
    ("query", 25),
    ("queue", 25),
    ("window", 18),
    ("widow", 2),
    ("spark", 9),
    ("shard", 9),
    ("def", 100),
]


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute(tokens, max_d=1):
    out = {}
    for t in sorted(set(tokens)):
        cands = [(lev(t, v), -df, v) for v, df in VOCAB if lev(t, v) <= max_d]
        if cands:
            d, ndf, v = min(cands)
            out[t] = (v, d, -ndf, True)
        else:
            out[t] = (t, -1, 0, False)
    return out


TOKENS = ["merg", "querry", "quer", "window", "windoww", "tabel", "sprk", "def", "zzz"]


@pytest.fixture(scope="module")
def engine_result(spark):
    vocab = spark.createDataFrame(VOCAB, "term string, df long")
    rows = correct_tokens(vocab, TOKENS, max_d=1).collect()
    return {r.token: (r.corrected, r.distance, r.df, r.matched) for r in rows}


def test_matches_bruteforce(engine_result):
    assert engine_result == brute(TOKENS)


def test_ties_break_on_df_then_term(engine_result):
    # "quer" is lev-1 from both "query" (25) and "queue" (25)? No:
    # lev("quer","queue")=2, lev("quer","query")=1 -> query wins.
    assert engine_result["quer"][0] == "query"


def test_exact_hit_wins(engine_result):
    assert engine_result["def"] == ("def", 0, 100, True)


def test_no_candidate_passthrough(engine_result):
    assert engine_result["zzz"] == ("zzz", -1, 0, False)


def test_delete_variants():
    assert delete_variants_py("ab") == ["ab", "b", "a"]
    assert delete_variants_py("aa") == ["aa", "a"]
    assert delete_variants_py("") == [""]


def test_empty_tokens(spark):
    vocab = spark.createDataFrame(VOCAB, "term string, df long")
    assert correct_tokens(vocab, []).count() == 0


def brute_d2(tokens):
    out = {}
    for t in sorted(set(tokens)):
        cands = [(lev(t, v), -df, v) for v, df in VOCAB if lev(t, v) <= 2]
        if cands:
            d, ndf, v = min(cands)
            out[t] = (v, d, -ndf, True)
        else:
            out[t] = (t, -1, 0, False)
    return out


def test_matches_bruteforce_d2(spark):
    """Reference SymSpell uses max_edit_distance=2
    (query_classifier.py:137-141): depth-2 deletion neighbourhoods must
    reproduce the exact lev<=2 brute-force correction."""
    vocab = spark.createDataFrame(VOCAB, "term string, df long")
    toks = TOKENS + ["tabel", "windw", "mrge", "qry"]
    rows = correct_tokens(vocab, toks, max_d=2).collect()
    got = {r.token: (r.corrected, r.distance, r.df, r.matched) for r in rows}
    assert got == brute_d2(toks)


def test_variants_py_depth2():
    vs = delete_variants_py("abc", 2)
    assert set(vs) == {"abc", "ab", "ac", "bc", "a", "b", "c"}

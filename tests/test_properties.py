"""Hypothesis property tests for the pure-Python engine functions
(no Spark session — these are the worker-side kernels, so property
coverage here is cheap and broad; SURVEY.md §5.2 item 3).

Chunker invariants (both modes), tokenizer algebraic properties, and
the split/pack laws of the separator-aware splitter.
"""

from __future__ import annotations

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from local_search_engine_spark.functions.tokenize import tokenize_py  # noqa: E402
from local_search_engine_spark.operators.chunking import (  # noqa: E402
    chunk_spans,
    pack_units,
    split_units,
)

texts = st.text(
    alphabet=st.sampled_from(list("ab z\n._09'!ü")), max_size=400
)
sizes = st.integers(min_value=2, max_value=60)


@given(texts, sizes)
@settings(max_examples=200, deadline=None)
def test_split_units_partition_text(text, size):
    """Units are a contiguous partition of the text: concatenation is the
    identity, each unit is non-empty and <= chunk_size."""
    units = split_units(text, size)
    assert "".join(text[s:e] for s, e in units) == text
    pos = 0
    for s, e in units:
        assert s == pos and e > s and e - s <= size
        pos = e
    assert pos == len(text)


@given(texts, sizes, st.integers(min_value=0, max_value=30))
@settings(max_examples=200, deadline=None)
def test_chunk_spans_invariants(text, size, overlap):
    if overlap >= size:
        overlap = size - 1
    spans = chunk_spans(text, size, overlap)
    # coverage: every char in >=1 chunk; chunks respect the size budget;
    # spans are sorted and overlap only by < size
    covered = set()
    prev_start = -1
    for s, e in spans:
        assert 0 <= s < e <= len(text)
        assert e - s <= size
        assert s > prev_start
        prev_start = s
        covered.update(range(s, e))
    assert covered == set(range(len(text)))


@given(texts, sizes, st.integers(min_value=0, max_value=30))
@settings(max_examples=200, deadline=None)
def test_pack_preserves_unit_boundaries(text, size, overlap):
    """Every chunk starts and ends exactly on unit boundaries."""
    if overlap >= size:
        overlap = size - 1
    units = split_units(text, size)
    starts = {s for s, _ in units}
    ends = {e for _, e in units}
    for s, e in pack_units(units, size, overlap):
        assert s in starts and e in ends


@given(st.lists(st.text(alphabet=st.sampled_from(list("abcxyz09_")), min_size=2, max_size=8), max_size=30))
@settings(max_examples=200, deadline=None)
def test_tokenizer_roundtrip_on_token_material(tokens):
    """Joining valid tokens with any separator and re-tokenizing gives
    the tokens back (lowercased) — the stability law the BM25 oracle
    relies on."""
    text = " ".join(tokens)
    assert tokenize_py(text) == [t.lower() for t in tokens]


@given(texts)
@settings(max_examples=200, deadline=None)
def test_tokenizer_idempotent_and_clean(text):
    """tokenize(join(tokenize(x))) == tokenize(x); every token is
    lowercase and either >= MIN_TOKEN_LEN or a preserved term."""
    from local_search_engine_spark.functions.tokenize import (
        MIN_TOKEN_LEN,
        PRESERVE_TERMS,
    )

    toks = tokenize_py(text)
    assert tokenize_py(" ".join(toks)) == toks
    for t in toks:
        assert t == t.lower()
        assert len(t) >= MIN_TOKEN_LEN or t in PRESERVE_TERMS


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200_000), min_size=1,
                 max_size=20, unique=True).map(sorted),
        min_size=0, max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_codec_roundtrip_property(postings):
    """decode_positions ∘ (per-posting delta encode) is the identity for
    ANY list of sorted position lists — the positional index's codec
    law (operators/positional.py)."""
    import numpy as np

    from local_search_engine_spark.functions.codec import encode_vb_sliced
    from local_search_engine_spark.operators.positional import decode_positions

    flat, starts = [], []
    for p in postings:
        starts.append(len(flat))
        flat.append(p[0])
        flat.extend(p[j] - p[j - 1] for j in range(1, len(p)))
    bufs = encode_vb_sliced(
        np.asarray(flat, np.uint64), np.asarray(starts, np.int64)
    )
    tfs = np.asarray([len(p) for p in postings], np.int64)
    got = decode_positions(b"".join(bufs), tfs)
    want = (
        np.concatenate([np.asarray(p, np.int64) for p in postings])
        if postings
        else np.empty(0, np.int64)
    )
    assert np.array_equal(got, want)


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=30),
        min_size=1, max_size=25,
    ),
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_phrase_kernel_matches_bruteforce_property(doc_tokens, phrase):
    """phrase_occurrences (composite-key intersection) equals the naive
    sliding-window count on ANY corpus of token streams — tiny alphabet
    maximizes collisions/overlaps (e.g. self-adjacent phrases)."""
    import numpy as np

    from local_search_engine_spark.operators.positional import (
        phrase_occurrences,
    )

    arrays: dict = {}
    per: dict = {}
    for d, toks in enumerate(doc_tokens):
        for i, t in enumerate(toks):
            per.setdefault(t, []).append((d, i))
    arrays = {
        t: (
            np.asarray([d for d, _ in v], np.int64),
            np.asarray([p for _, p in v], np.int64),
        )
        for t, v in per.items()
    }
    docs, counts = phrase_occurrences(arrays, phrase)
    got = dict(zip(docs.tolist(), counts.tolist()))
    want = {}
    L = len(phrase)
    for d, toks in enumerate(doc_tokens):
        c = sum(1 for i in range(len(toks) - L + 1) if toks[i : i + L] == phrase)
        if c:
            want[d] = c
    assert got == want


def test_repetition_scores_known_values(spark):
    """Hand-computed Gopher repetition fractions."""
    from local_search_engine_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [
            # 3 non-blank lines, one dup -> dup_line 1/3. Tokens span
            # lines: [spam spam spam eggs spam spam] -> 5 2-grams with
            # 3 distinct (dup 2/5); 4 3-grams all distinct (dup 0)
            (1, "spam spam\nspam eggs\n\nspam spam"),
            (2, ""),  # empty: all zero, passes
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TS.repetition_scores(docs).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert abs(r1["dup_line_frac"] - round(1 / 3, 6)) < 1e-9
    assert abs(r1["dup_2gram_frac"] - 0.4) < 1e-9
    assert r1["dup_3gram_frac"] == 0.0
    assert abs(r1["mean_word_len"] - 4.0) < 1e-9
    assert not r1["repetition_pass"]  # 1/3 > 0.30 on lines and 2-grams
    r2 = rows[2]
    assert r2["n_lines"] == 0 and r2["repetition_pass"]


def test_repetition_scores_zero_shuffle(spark):
    from local_search_engine_spark.operators import textstats as TS

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        TS.repetition_scores(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_doc_id_enumeration_dense_deterministic_no_window(spark):
    """with_doc_ids assigns the dense 0-based global rank by the unique
    (repo, path, commit) key, deterministically across evaluations, and
    the enumeration itself plans NO Window and NO Exchange above the
    cached sorted key table (the monotonically_increasing_id low-bits
    local rank replaces the old row_number window, which forced a full
    hash Exchange of the key table)."""
    from local_search_engine_spark.operators.build import with_doc_ids
    from local_search_engine_spark.sources.corpus import gen_corpus_spark

    corpus = gen_corpus_spark(spark, 300)
    ids = with_doc_ids(corpus)
    rows = ids.select("repo", "path", "commit", "doc_id").collect()
    expect = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    assert [r["doc_id"] for r in expect] == list(range(len(rows)))
    again = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"] for r in ids.collect()
    }
    assert all(
        again[(r["repo"], r["path"], r["commit"])] == r["doc_id"] for r in rows
    )
    plan = ids._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # the only Exchange allowed in the doc-id plan is the join back to
    # the corpus (broadcast at this size → none at all) — the cached
    # range shuffle is below the InMemoryTableScan and does not re-plan
    above_cache = plan.split("InMemoryTableScan")[0]
    assert "Exchange hashpartitioning" not in above_cache, plan


def test_term_frequencies_inrow_equals_shuffle_and_zero_exchange(spark):
    """The in-row run-length tf plan (build default) is value-identical
    to the explode+groupBy shuffle plan and contains NO Exchange —
    per-doc term counts never need to leave the row."""
    from pyspark.sql import functions as F

    from local_search_engine_spark.operators.build import (
        term_frequencies,
        tokenized_docs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("text", "content")
    )
    # token-less docs (empty text / everything below MIN_TOKEN_LEN) must
    # produce NO tf row on either plan — the inrow zip_with null-pad
    # regression emitted a (doc_id, NULL, NULL) row for them
    extra = spark.createDataFrame(
        [(-1, ""), (-2, "a b"), (-3, "zz zz yy")], "doc_id long, content string"
    )
    docs = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "content"
    ).unionByName(extra)
    tok = tokenized_docs(docs)
    a = term_frequencies(tok, impl="shuffle")
    b = term_frequencies(tok, impl="inrow")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert b.where(F.col("term").isNull()).count() == 0
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.usefixtures("spark")
def test_code_tokenizer_twins_property(spark):
    """Property: tokenize_code_py == tokenize_code_expr on random
    identifier-ish text (hypothesis strategies over case transitions,
    underscores, digits, punctuation, unicode)."""
    from pyspark.sql import functions as F

    from local_search_engine_spark.functions.tokenize import (
        tokenize_code_expr,
        tokenize_code_py,
    )

    code_texts = st.lists(
        st.text(
            alphabet=st.sampled_from(list("abXYZ_09 .(:\nüA")), max_size=24
        ),
        max_size=12,
    ).map(" ".join)

    @given(code_texts)
    @settings(max_examples=60, deadline=None)
    def check(text):
        df = spark.createDataFrame([(text,)], "t string")
        got = df.select(tokenize_code_expr(F.col("t")).alias("x")).first()["x"]
        assert got == tokenize_code_py(text), repr(text)

    check()

"""Relevance feedback (the reference's TODO, implemented): Rocchio
vector algebra, tf-idf expansion terms, and the end-to-end behavior —
no feedback degenerates to plain hybrid; positive feedback pulls the
judged doc's neighbourhood up."""

from __future__ import annotations

from local_search_engine_spark.operators.feedback import (
    expansion_terms,
    rocchio_vector,
    search_with_feedback,
)


def test_rocchio_vector_algebra(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [4.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = [0.0, 0.0]
    # only positives: q' = 0 + 0.75 * centroid({(1,0),(0,1)}) = (0.375, 0.375)
    got = rocchio_vector(q, emb, {1: 1.0, 2: 0.5})
    assert got == [0.375, 0.375]
    # negative subtracts gamma * centroid
    got = rocchio_vector([1.0, 1.0], emb, {3: -1.0}, alpha=1.0, gamma=0.5)
    assert got == [1.0 - 0.5 * 4.0, 1.0]
    # empty feedback: identity
    assert rocchio_vector([0.25, 0.5], emb, {}) == [0.25, 0.5]
    # feedback ids absent from the table: identity under alpha=1
    assert rocchio_vector([0.25, 0.5], emb, {99: 1.0}) == [0.25, 0.5]


def test_expansion_terms_tfidf_order(spark):
    from local_search_engine_spark.operators.build import build_index_from

    docs = spark.createDataFrame(
        [
            (0, "zebra zebra zebra unique_rare common common"),
            (1, "common common common filler filler"),
            (2, "other words entirely here"),
            (3, "third doc words common"),
        ],
        "doc_id long, text string",
    )
    idx = build_index_from(docs, text_col="text", cache=False)
    terms = expansion_terms(idx, [0], top_m=2)
    # zebra: tf 3 x positive idf beats unique_rare (tf 1); 'common' has
    # low/negative idf on this tiny corpus and must not dominate
    assert terms[0] == "zebra"
    assert "common" not in terms
    assert expansion_terms(idx, []) == []
    got = expansion_terms(idx, [0], top_m=2, exclude={"zebra"})
    assert "zebra" not in got


def test_search_with_feedback_end_to_end(spark):
    from local_search_engine_spark.operators.build import build_index_from

    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, "spark merge join shuffle partition"))
        elif i % 3 == 1:
            rows.append((i, "python pandas dataframe groupby"))
        else:
            rows.append((i, "rust compiler borrow checker lifetimes"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index_from(docs, text_col="text", cache=False)
    import hashlib

    def vec(i):
        base = [0.0] * 8
        base[i % 3] = 1.0
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        base[3 + (h % 5)] = 0.3
        return base

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(30)], "vec_id long, embedding array<double>"
    )
    qv = [0.1] * 8  # near-uninformative query vector

    plain, _ = search_with_feedback(idx, emb, "merge", qv, feedback=None, k=9)
    plain_rows = [(r["fused_rank"], r["id"]) for r in plain.collect()]
    from local_search_engine_spark.operators.retrieval import hybrid_search

    base, _ = hybrid_search(idx, emb, "merge", qv, k=9)
    assert plain_rows == [(r["fused_rank"], r["id"]) for r in base.collect()]

    # judge two docs of the %3==0 family relevant, one other negative:
    # the returned top-k should tilt toward the family
    fb, _ = search_with_feedback(
        idx, emb, "merge", qv, feedback={0: 1.0, 3: 1.0, 1: -1.0}, k=9
    )
    fb_ids = [r["id"] for r in fb.collect()]
    fam = sum(1 for i in fb_ids if i % 3 == 0)
    base_fam = sum(1 for _, i in plain_rows if i % 3 == 0)
    assert fam >= base_fam
    assert fam >= 6, (fb_ids, fam)

"""Trigram-indexed literal search: index-pruned results equal the full
verify scan exactly; bucket layout prunes at scan time; DuckDB twin
agrees on the candidate semantics."""

from __future__ import annotations

from local_search_engine_spark.operators.trigram import (
    build_trigram_index,
    doc_trigrams,
    literal_query_trigrams,
    trigram_search,
)

ROWS = [
    (0, "def merge_shard(a, b):\n    return a + b"),
    (1, "class MergeShard:\n    def merge_shard(self):\n        pass"),
    (2, "nothing relevant here at all"),
    (3, "merge_shar is a near miss; shard_merge too"),
    (4, "xx"),          # shorter than a trigram
    (5, ""),
]
LITERALS = ["merge_shard(", "merge_shard", "shard", "def ", "zz_absent", "a"]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, content string")


def test_trigram_extraction_edges(spark):
    got = {
        (r["doc_id"], r["trigram"])
        for r in doc_trigrams(_docs(spark).filter("doc_id >= 4")).collect()
    }
    assert got == set()  # docs shorter than 3 chars emit nothing
    tri = {
        r["trigram"]
        for r in doc_trigrams(_docs(spark).filter("doc_id = 0")).collect()
    }
    assert "def" in tri and "urn" in tri and len(tri) == len(set(tri))
    assert literal_query_trigrams("abcd") == ["abc", "bcd"]
    assert literal_query_trigrams("ab") == []


def test_search_with_index_equals_full_scan(spark, tmp_path):
    docs = _docs(spark)
    idx_dir = str(tmp_path / "tri")
    build_trigram_index(docs, idx_dir)
    index = spark.read.parquet(idx_dir)
    for lit in LITERALS:
        want = sorted(
            r["doc_id"] for r in trigram_search(docs, lit, index=None).collect()
        )
        got = sorted(
            r["doc_id"] for r in trigram_search(docs, lit, index=index).collect()
        )
        assert got == want, lit
    # sanity on the fixture itself
    hit = sorted(
        r["doc_id"]
        for r in trigram_search(docs, "merge_shard(", index=index).collect()
    )
    assert hit == [0, 1]


def test_index_scan_prunes_buckets_and_candidates(spark, tmp_path):
    docs = _docs(spark)
    idx_dir = str(tmp_path / "tri")
    build_trigram_index(docs, idx_dir)
    index = spark.read.parquet(idx_dir)
    out = trigram_search(docs, "merge_shard(", index=index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    # the miss doc (3) contains every trigram of 'merge_shard' except
    # the ones spanning the missing 'd' boundary — the AND count must
    # exclude it before the verify
    cand_only = trigram_search(docs, "merge_shard", index=index)
    assert sorted(r["doc_id"] for r in cand_only.collect()) == [0, 1]


def test_duckdb_twin_candidates(spark, tmp_path):
    """DuckDB computes the same AND-of-trigrams candidate set + verify
    from the same rows — pins cross-engine trigram semantics."""
    import duckdb

    lit = "merge_shard("
    need = literal_query_trigrams(lit)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, content VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    vals = ", ".join("(" + "'" + g.replace("'", "''") + "')" for g in need)
    want = [
        r[0]
        for r in con.execute(
            f"""
WITH need(g) AS (VALUES {vals}),
tri AS (SELECT DISTINCT doc_id, substr(content, i::int, 3) AS g
        FROM t, unnest(range(1, greatest(length(content) - 1, 1))) r(i)
        WHERE length(content) >= 3),
cand AS (SELECT doc_id FROM tri JOIN need USING (g)
         GROUP BY doc_id HAVING count(*) = (SELECT count(*) FROM need))
SELECT doc_id FROM t JOIN cand USING (doc_id)
WHERE contains(content, '{lit.replace("'", "''")}') ORDER BY doc_id
"""
        ).fetchall()
    ]
    docs = _docs(spark)
    idx_dir = str(tmp_path / "tri")
    build_trigram_index(docs, idx_dir)
    got = sorted(
        r["doc_id"]
        for r in trigram_search(
            docs, lit, index=spark.read.parquet(idx_dir)
        ).collect()
    )
    assert got == want == [0, 1]


def test_regex_plan_classification():
    from local_search_engine_spark.operators.trigram import regex_trigram_plan

    assert regex_trigram_plan("merge_shard") == ("and", ["merge_shard"])
    assert regex_trigram_plan("foo|barbaz") == ("or", ["foo", "barbaz"])
    assert regex_trigram_plan("ab") == ("scan", [])          # too short
    assert regex_trigram_plan("foo|x") == ("scan", [])       # short branch
    assert regex_trigram_plan("me.ge") == ("scan", [])       # metachar
    assert regex_trigram_plan("a(b|c)d") == ("scan", [])     # nested alt


def test_regex_search_equals_full_rlike_scan(spark, tmp_path):
    from local_search_engine_spark.operators.trigram import trigram_search_regex

    docs = _docs(spark)
    idx_dir = str(tmp_path / "tri")
    build_trigram_index(docs, idx_dir)
    index = spark.read.parquet(idx_dir)
    patterns = [
        "merge_shard",          # and
        "shard|relevant",       # or of literals
        "merge.?shard",         # metachars -> fallback scan
        "absent_one|missing2",  # or, zero hits
        "xx",                   # short -> fallback
    ]
    for pat in patterns:
        want = sorted(
            r["doc_id"]
            for r in trigram_search_regex(docs, pat, index=None).collect()
        )
        got = sorted(
            r["doc_id"]
            for r in trigram_search_regex(docs, pat, index=index).collect()
        )
        assert got == want, pat
    assert sorted(
        r["doc_id"]
        for r in trigram_search_regex(docs, "shard|relevant", index=index).collect()
    ) == [0, 1, 2, 3]

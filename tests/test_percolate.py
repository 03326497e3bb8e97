"""Percolation (streaming/percolate.py): standing phrase queries over a
document stream. The batch twin equals (a) a brute-force python
matcher, (b) the positional-index phrase path, and (c) a DuckDB
zipped-unnest matcher; the streaming shape equals the batch twin over
micro-batched input and its plan carries no state store; the batch plan
is a narrow zero-Exchange map."""

from __future__ import annotations

import random

from local_search_engine_spark.functions.tokenize import tokenize_py
from local_search_engine_spark.streaming.percolate import (
    percolate,
    percolate_stream,
)

VOCAB = ["table", "scan", "agg", "row", "fast", "io"]
PHRASES = [
    (0, "table scan"),
    (1, "agg row scan"),
    (2, "table table"),
    (3, "fast io"),
    (4, "table zz_absent"),
]


def _gen_rows(n, seed=21):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 30))))
        for i in range(n)
    ]
    rows.append((n, ""))
    rows.append((n + 1, "a table, a SCAN; table-table!"))
    return rows


def _brute(rows):
    want = set()
    for doc_id, text in rows:
        toks = tokenize_py(text)
        for qid, ph in PHRASES:
            q = tokenize_py(ph)
            c = sum(
                1
                for i in range(len(toks) - len(q) + 1)
                if toks[i : i + len(q)] == q
            )
            if c:
                want.add((doc_id, qid, c))
    return want


def test_percolate_matches_bruteforce_and_index_path(spark):
    rows = _gen_rows(50)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["query_id"], r["phrase_tf"])
        for r in percolate(docs, PHRASES).collect()
    }
    assert got == _brute(rows)
    assert got, "fixture produced no matches — vacuous"

    # the positional-index path computes the same (doc, tf) sets
    from local_search_engine_spark.operators.positional import (
        build_positional_postings,
        make_phrase_topk,
    )

    postings = build_positional_postings(
        docs, docs_per_shard=16, block_span=8, n_buckets=8
    )
    q = make_phrase_topk(postings, block_span=8, n_buckets=8)
    via_index = {
        (r["doc_id"], pid, r["phrase_tf"])
        for pid, ph, k in [(p, t, len(rows)) for p, t in PHRASES]
        for r in q(ph, k).collect()
    }
    assert via_index == got


def test_percolate_duckdb_twin(spark):
    import duckdb

    rows = _gen_rows(40, seed=4)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["query_id"], r["phrase_tf"])
        for r in percolate(docs, PHRASES).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),"
        " x -> length(x) >= 2 OR x IN ('ai','ml','js','ip','db','os','io'))"
    )
    want = set()
    for qid, ph in PHRASES:
        q = tokenize_py(ph)
        joins = " ".join(
            f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.p = t0.p + {i} "
            f"AND t{i}.t = '{t}'"
            for i, t in enumerate(q[1:], 1)
        )
        sql = f"""
WITH tok AS (SELECT doc_id, unnest(toks) AS t, unnest(range(len(toks))) AS p
             FROM (SELECT doc_id, {toks} AS toks FROM t))
SELECT t0.doc_id, count(*) FROM tok t0 {joins}
WHERE t0.t = '{q[0]}' GROUP BY 1
"""
        for d, c in con.execute(sql).fetchall():
            want.add((d, qid, c))
    assert got == want


def test_percolate_plan_is_narrow(spark):
    docs = spark.createDataFrame(_gen_rows(10), "doc_id long, text string")
    plan = (
        percolate(docs, PHRASES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_percolate_stream_matches_batch(spark, tmp_path):
    import os

    rows = _gen_rows(40, seed=9)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    docs.repartition(4).write.mode("append").parquet(watch)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    q = (
        percolate_stream(stream, PHRASES)
        .writeStream.format("memory")
        .queryName("perc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"], r["phrase_tf"])
        for r in spark.sql("SELECT * FROM perc_out").collect()
    }
    want = {
        (r["doc_id"], r["query_id"], r["phrase_tf"])
        for r in percolate(docs, PHRASES).collect()
    }
    assert got == want
    # stateless: no state-store operators ran in any micro-batch
    prog = q.lastProgress
    assert prog is not None and list(prog["stateOperators"]) == [], prog

    import pytest

    with pytest.raises(ValueError):
        percolate_stream(stream, [(0, "!!")])

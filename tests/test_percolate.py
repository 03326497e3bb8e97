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


# ---------------------------------------------------------------------------
# boolean percolation (r05c)
# ---------------------------------------------------------------------------

BOOL_STANDING = [
    (0, "table AND scan AND NOT agg"),
    (1, '"table scan" OR fast'),
    (2, '"fast io"~3 AND NOT "table scan"'),
    (3, "ta* AND io"),
    (4, "tabel~1 OR /fast io/"),
    (5, "NOT table"),  # batch-universe NOT
    (6, "lang:en AND n_chars:>20 AND table"),
    (7, "fast^2 AND scan"),  # boost is matching-transparent
    (8, "zz_absent AND table"),  # OOV conjunct -> no rows
    (9, '"table sc*" OR "fast io"'),  # phrase-prefix (search-as-you-type)
    (10, "(table OR fast OR io)~2 AND NOT agg"),  # minimum-should-match
    (11, "NOT (table OR scan OR io)~2"),  # msm under NOT
]


def _syn_standing():
    """Standing queries given as pre-expanded ASTs (the synonym path a
    saved-search store would persist): both engine evaluators must
    agree on expanded trees too."""
    from local_search_engine_spark.operators.boolquery import (
        expand_synonyms,
        parse_query,
    )

    g = [["fast", "slow"]]
    return [
        (100, expand_synonyms(parse_query("fast AND NOT agg"), g)),
        (101, expand_synonyms(parse_query("(fast OR table OR io)~2"), g)),
    ]


def _bool_rows(n=60, seed=33):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 25)))
        rows.append((i, text, ["en", "de"][i % 2], len(text)))
    rows.append((n, "", "en", 0))
    rows.append((n + 1, "fast x1 y2 io table scan", "de", 24))
    return rows


def test_percolate_bool_equals_index_path(spark):
    """Engine-vs-engine identity: the index-free boolean percolator and
    boolquery.matches over an index of the SAME docs must produce the
    identical (doc_id, query_id, n_hits) rows for every standing query
    across every leaf kind (term/phrase/slop/prefix/fuzzy/regex/field/
    boost/NOT)."""
    from local_search_engine_spark.operators import boolquery as bq
    from local_search_engine_spark.operators.build import build_index_from
    from local_search_engine_spark.operators.positional import (
        build_positional_postings,
        make_phrase_topk,
    )
    from local_search_engine_spark.operators.trigram import doc_trigrams
    from local_search_engine_spark.streaming.percolate import percolate_bool

    rows = _bool_rows()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).repartition(4)
    standing = BOOL_STANDING + _syn_standing()
    got = {
        (r["doc_id"], r["query_id"], r["n_hits"])
        for r in percolate_bool(df, standing).collect()
    }

    idx = build_index_from(df, text_col="text")
    pq = make_phrase_topk(
        build_positional_postings(df, docs_per_shard=16, block_span=8, n_buckets=8),
        block_span=8,
        n_buckets=8,
    )
    content = df.select("doc_id", "text")
    rq = bq.make_regex_matcher(
        content, text_col="text", trigram=doc_trigrams(content, text_col="text")
    )
    want = set()
    for qid, q in standing:
        for r in bq.matches(idx, q, phrase_query=pq, regex_query=rq).collect():
            want.add((r["doc_id"], qid, r["n_hits"]))
    assert got == want
    assert any(q == 10 for _, q, _ in got)  # msm family non-vacuous
    assert any(q == 101 for _, q, _ in got)  # expanded-tree family too
    assert any(q == 8 for _, q, _ in got) is False  # OOV conjunct empty
    assert got  # non-vacuous


def test_percolate_bool_field_schema_validation(spark):
    from local_search_engine_spark.streaming.percolate import percolate_bool

    df = spark.createDataFrame([(0, "table scan")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="field leaves"):
        percolate_bool(df, [(0, "lang:en AND table")]).collect()


def test_percolate_bool_stream_matches_batch(spark, tmp_path):
    """The streaming shape over micro-batched file input equals the
    batch twin — and the batch boundary is invisible (NOT ranges over
    each incoming batch, which is the percolation universe)."""
    from local_search_engine_spark.streaming.percolate import (
        percolate_bool,
        percolate_bool_stream,
    )

    rows = _bool_rows(40)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    src = str(tmp_path / "src")
    # two files -> at least two micro-batches under maxFilesPerTrigger=1
    df.filter("doc_id % 2 = 0").coalesce(1).write.parquet(src)
    df.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    standing = [q for q in BOOL_STANDING if q[0] != 6] + [
        (6, "lang:en AND n_chars:>20 AND table")
    ]
    out = percolate_bool_stream(stream, standing)
    q = (
        out.writeStream.format("memory")
        .queryName("perc_bool_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"], r["n_hits"])
        for r in spark.sql("SELECT * FROM perc_bool_mem").collect()
    }
    want = {
        (r["doc_id"], r["query_id"], r["n_hits"])
        for r in percolate_bool(df, standing).collect()
    }
    assert got == want and got


def test_percolate_cli_bool_batch(spark, tmp_path):
    """scripts/percolate.py --bool end to end in a subprocess: standing
    boolean queries over a parquet dir, JSON result with per-query
    counts equal to the in-process percolate_bool."""
    import json as _json
    import os
    import subprocess
    import sys

    from local_search_engine_spark.streaming.percolate import percolate_bool

    rows = _bool_rows(40)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    src = str(tmp_path / "docs")
    df.write.parquet(src)
    standing = [
        [0, "table AND scan AND NOT agg"],
        [1, '"fast io"~3 OR lang:de'],
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(root, "scripts", "percolate.py"),
            "--docs", src,
            "--bool",
            "--phrases", _json.dumps(standing),
            "--cores", "2",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _json.loads(proc.stdout.strip().splitlines()[-1])
    want = {
        int(r["query_id"]): int(r["n"])
        for r in percolate_bool(df, [(int(a), b) for a, b in standing])
        .groupBy("query_id").count().withColumnRenamed("count", "n").collect()
    }
    assert out["per_query_matches"] == {str(k): v for k, v in want.items()} or \
        {int(k): v for k, v in out["per_query_matches"].items()} == want
    assert out["n_matches"] == sum(want.values()) > 0

"""PII/secret scrubbing: planted-pattern redaction, count semantics,
replacement order, and the DuckDB twin's byte-identical output."""

from __future__ import annotations

from local_search_engine_spark.operators.scrub import pii_scrub, pii_scrub_sql

ROWS = [
    (0, "mail a.user+tag@corp-mail.example.org and b@x.io end"),
    (1, "server 192.168.0.1 talks to 10.0.255.7"),
    (2, "token deadbeefdeadbeefdeadbeefdeadbeef0123 ok"),
    (3, "clean text with no secrets at all"),
    (4, "combo u@v.dev at 8.8.8.8 key 0123456789abcdef0123456789abcdef"),
    (5, ""),
    (6, "short hex cafebabe is NOT a secret (under 32 chars)"),
]


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df, "text", "doc_id").collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_hex_secret"]) == (2, 0, 0)
    assert got[0]["scrubbed"] == "mail <EMAIL> and <EMAIL> end"
    assert got[1]["n_ipv4"] == 2
    assert got[1]["scrubbed"] == "server <IP> talks to <IP>"
    assert got[2]["n_hex_secret"] == 1
    assert got[2]["scrubbed"] == "token <SECRET> ok"
    assert got[3]["scrubbed"] == ROWS[3][1]  # untouched
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_hex_secret"]) == (1, 1, 1)
    assert got[4]["scrubbed"] == "combo <EMAIL> at <IP> key <SECRET>"
    assert got[5]["scrubbed"] == "" and got[5]["n_email"] == 0
    assert got[6]["n_hex_secret"] == 0  # 32-char floor


def test_pii_scrub_zero_shuffle(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        pii_scrub(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_pii_scrub_duckdb_twin_matches(spark):
    """The SQL twin produces byte-identical scrubbed text and counts on
    every fixture row — cross-engine regex semantics pinned."""
    import duckdb

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = sorted(tuple(r) for r in pii_scrub(df, "text", "doc_id").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    want = sorted(
        tuple(r)
        for r in con.execute(
            pii_scrub_sql("text", "doc_id") + " FROM t"
        ).fetchall()
    )
    assert got == want

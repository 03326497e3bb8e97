"""Positional postings: phrase/proximity results equal a brute-force
token-scan twin exactly; the persisted index prunes bucket directories;
the position codec round-trips."""

from __future__ import annotations

import random

import numpy as np

from local_search_engine_spark.functions.codec import encode_vb_sliced
from local_search_engine_spark.functions.tokenize import tokenize_py
from local_search_engine_spark.operators.positional import (
    build_positional_postings,
    decode_positions,
    load_positional_postings,
    make_phrase_topk,
    persist_positional_postings,
    phrase_occurrences,
    proximity_docs,
)

VOCAB = ["table", "scan", "agg", "row", "part", "fast", "slow", "io", "x1"]


def _gen_rows(n_docs: int, seed: int = 7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(0, 40))]
        rows.append((i, " ".join(words)))
    # edges: empty, single token, overlapping repeats, punctuation +
    # filtered-out short tokens shifting positions
    rows += [
        (n_docs, ""),
        (n_docs + 1, "table"),
        (n_docs + 2, "table table table table"),
        (n_docs + 3, "a table, a table; a TABLE-table!"),
    ]
    return rows


def _brute_phrase(rows, phrase: str) -> dict[int, int]:
    q = tokenize_py(phrase)
    out = {}
    for doc_id, text in rows:
        toks = tokenize_py(text)
        c = sum(
            1
            for i in range(len(toks) - len(q) + 1)
            if toks[i : i + len(q)] == q
        )
        if c:
            out[doc_id] = c
    return out


def _brute_near(rows, phrase: str, window: int) -> dict[int, int]:
    q = list(dict.fromkeys(tokenize_py(phrase)))
    out = {}
    for doc_id, text in rows:
        toks = tokenize_py(text)
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        if any(t not in pos for t in q):
            continue
        anchors = sum(
            1
            for p in pos[q[0]]
            if all(
                any(p - window <= r <= p + window for r in pos[t])
                for t in q[1:]
            )
        )
        if anchors:
            out[doc_id] = anchors
    return out


def test_position_codec_roundtrip():
    rng = random.Random(3)
    postings = [sorted(rng.sample(range(5000), rng.randint(1, 30))) for _ in range(50)]
    flat, starts = [], []
    for p in postings:
        starts.append(len(flat))
        flat.append(p[0])
        flat.extend(p[j] - p[j - 1] for j in range(1, len(p)))
    bufs = encode_vb_sliced(np.asarray(flat, np.uint64), np.asarray(starts, np.int64))
    buf = b"".join(bufs)
    tfs = np.asarray([len(p) for p in postings], np.int64)
    got = decode_positions(buf, tfs)
    want = np.concatenate([np.asarray(p, np.int64) for p in postings])
    assert np.array_equal(got, want)
    assert decode_positions(b"", np.empty(0, np.int64)).size == 0


PHRASES = [
    "table scan",           # common bigram
    "agg row scan",         # trigram
    "table table",          # self-adjacent (overlapping occurrences)
    "slow io",              # preserve-list short token inside a phrase
    "table",                # single term == tf
    "table zz_absent",      # OOV term -> empty
]


def test_phrase_equals_bruteforce(spark):
    rows = _gen_rows(60)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # tiny shards + blocks so phrases cross block/shard machinery
    postings = build_positional_postings(
        docs, docs_per_shard=16, block_span=4, n_buckets=8
    )
    q = make_phrase_topk(postings, block_span=4, n_buckets=8)
    for phrase in PHRASES:
        want = _brute_phrase(rows, phrase)
        got = {
            r["doc_id"]: r["phrase_tf"]
            for r in q(phrase, k=len(rows)).collect()
        }
        assert got == want, phrase
    # top-k rank rule: count desc, doc_id asc, cut at k
    want = sorted(_brute_phrase(rows, "table scan").items(), key=lambda t: (-t[1], t[0]))[:5]
    got = [(r["doc_id"], r["phrase_tf"]) for r in q("table scan", k=5).orderBy("rank").collect()]
    assert got == want


def test_phrase_batch_matches_singles(spark):
    rows = _gen_rows(40, seed=11)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_positional_postings(docs, docs_per_shard=16, block_span=8, n_buckets=8)
    q = make_phrase_topk(postings, block_span=8, n_buckets=8)
    batch = q.query_set([(i, p, 10) for i, p in enumerate(PHRASES)]).collect()
    by_pid = {}
    for r in batch:
        by_pid.setdefault(r["phrase_id"], []).append((r["rank"], r["doc_id"], r["phrase_tf"]))
    for i, p in enumerate(PHRASES):
        single = [(r["rank"], r["doc_id"], r["phrase_tf"]) for r in q(p, 10).collect()]
        assert sorted(by_pid.get(i, [])) == sorted(single), p


def test_proximity_equals_bruteforce(spark):
    rows = _gen_rows(50, seed=5)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_positional_postings(docs, docs_per_shard=16, block_span=4, n_buckets=8)
    q = make_phrase_topk(postings, block_span=4, n_buckets=8)
    for phrase, w in [("table scan", 3), ("agg row", 1), ("fast slow io", 5)]:
        want = _brute_near(rows, phrase, w)
        got = {
            r["doc_id"]: r["n_anchors"]
            for r in q.near(phrase, k=len(rows), window=w).collect()
        }
        assert got == want, (phrase, w)


def test_id_guards(spark):
    import pytest

    # non-integral id column refused at plan time
    docs = spark.createDataFrame([("a", "table scan")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral"):
        build_positional_postings(docs)
    # ids >= 2^31 refused at encode time (composite-key arithmetic)
    big = spark.createDataFrame(
        [(1 << 32, "table scan table scan")], "doc_id long, text string"
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((Py4JJavaError, PythonException, Exception)) as ei:
        build_positional_postings(big, docs_per_shard=16).count()
    assert "doc_id < 2^31" in str(ei.value)
    # negative ids refused too (r05, ADVICE): they pass the integral and
    # upper-bound checks but wrap on the uint64 composite-key cast
    neg = spark.createDataFrame(
        [(-3, "table scan table scan")], "doc_id long, text string"
    )
    with pytest.raises((Py4JJavaError, PythonException, Exception)) as ei:
        build_positional_postings(neg, docs_per_shard=16).count()
    assert "doc_id < 2^31" in str(ei.value)


def test_kernel_edges():
    # shard-kernel unit surface, no Spark: OOV, empty arrays
    arrays = {"ta": (np.asarray([1, 1, 2], np.int64), np.asarray([0, 4, 1], np.int64))}
    d, c = phrase_occurrences(arrays, ["ta", "zz"])
    assert d.size == 0 and c.size == 0
    d, c = phrase_occurrences(arrays, ["ta"])
    assert d.tolist() == [1, 2] and c.tolist() == [2, 1]
    d, c = proximity_docs(arrays, ["ta", "zz"], 2)
    assert d.size == 0


def test_append_equals_full_rebuild(spark, tmp_path):
    """Tail-append to a persisted positional index ≡ a full rebuild over
    the whole corpus — for exact phrase AND proximity, including phrases
    matching across the seam block; non-tailing appends are refused."""
    import pytest

    from local_search_engine_spark.operators.positional import (
        append_positional_postings,
        load_positional_meta,
    )

    rows = _gen_rows(60, seed=13)
    base, tail = rows[:40], rows[40:]
    params = {"docs_per_shard": 16, "block_span": 8, "n_buckets": 8}
    path = str(tmp_path / "pos_idx")
    persist_positional_postings(
        build_positional_postings(spark.createDataFrame(base, "doc_id long, text string"), **params),
        path,
        params=params,
    )
    meta = append_positional_postings(
        spark, path, spark.createDataFrame(tail, "doc_id long, text string")
    )
    assert meta["max_doc_id"] == max(d for d, _ in tail)
    appended = load_positional_postings(spark, path)
    rebuilt = build_positional_postings(
        spark.createDataFrame(rows, "doc_id long, text string"), **params
    )
    qa = make_phrase_topk(appended, block_span=8, n_buckets=8)
    qr = make_phrase_topk(rebuilt, block_span=8, n_buckets=8)
    for phrase in PHRASES:
        assert sorted(map(tuple, qa(phrase, 100).collect())) == sorted(
            map(tuple, qr(phrase, 100).collect())
        ), phrase
    assert sorted(map(tuple, qa.near("table scan", 100, 3).collect())) == sorted(
        map(tuple, qr.near("table scan", 100, 3).collect())
    )
    # in-range insert refused (would interleave existing runs)
    with pytest.raises(ValueError, match="strictly tailing"):
        append_positional_postings(
            spark, path, spark.createDataFrame([(5, "table scan")], "doc_id long, text string")
        )
    assert load_positional_meta(path)["max_doc_id"] == meta["max_doc_id"]

    # crash-retry safety (r05, ADVICE): simulate a crash BETWEEN the
    # delta-parquet commit and the _meta.json rewrite by rolling meta
    # back to the pre-append max. A blind retry of the same tail batch
    # must be REFUSED (the postings already contain it — the healed max
    # comes from the parquet, not the stale meta), and meta must heal.
    import json
    import os

    stale = dict(meta)
    stale["max_doc_id"] = max(d for d, _ in base)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(stale, f)
    with pytest.raises(ValueError, match="strictly tailing"):
        append_positional_postings(
            spark, path, spark.createDataFrame(tail, "doc_id long, text string")
        )
    assert load_positional_meta(path)["max_doc_id"] == meta["max_doc_id"]


def test_persisted_index_prunes_and_agrees(spark, tmp_path):
    rows = _gen_rows(40, seed=9)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_positional_postings(docs, docs_per_shard=16, block_span=8, n_buckets=8)
    path = str(tmp_path / "pos_idx")
    persist_positional_postings(postings, path)
    loaded = load_positional_postings(spark, path)
    q_mem = make_phrase_topk(postings, block_span=8, n_buckets=8)
    q_disk = make_phrase_topk(loaded, block_span=8, n_buckets=8)
    out = q_disk("table scan", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, q_mem("table scan", k=10).collect())
    )


def test_compaction_equals_fresh_rebuild(spark, tmp_path):
    """r05: after several tail-appends, compact_positional_postings
    rewrites each (bucket, shard) group through the canonical encoder —
    the compacted index must be ROW-IDENTICAL to a fresh build over the
    whole corpus (same runs, same encoded bytes), shrink the parquet
    file count, keep every phrase/proximity result bit-exact, and stay
    appendable afterwards."""
    from local_search_engine_spark.operators.positional import (
        append_positional_postings,
        compact_positional_postings,
        load_positional_meta,
    )

    rows = _gen_rows(80, seed=29)
    params = {"docs_per_shard": 24, "block_span": 8, "n_buckets": 8}
    path = str(tmp_path / "pos_idx")
    persist_positional_postings(
        build_positional_postings(
            spark.createDataFrame(rows[:30], "doc_id long, text string"), **params
        ),
        path,
        params=params,
    )
    for lo, hi in ((30, 50), (50, 70), (70, len(rows))):
        append_positional_postings(
            spark, path,
            spark.createDataFrame(rows[lo:hi], "doc_id long, text string"),
        )
    q_before = make_phrase_topk(
        load_positional_postings(spark, path), block_span=8, n_buckets=8
    )
    want = {
        ph: sorted(map(tuple, q_before(ph, 1000).collect())) for ph in PHRASES
    }
    want_near = sorted(map(tuple, q_before.near("table scan", 1000, 3).collect()))

    info = compact_positional_postings(spark, path)
    assert info["n_files_after"] < info["n_files_before"], info
    assert info["n_runs_after"] <= info["n_runs_before"], info

    # row-identical to a fresh build over the whole corpus
    fresh = build_positional_postings(
        spark.createDataFrame(rows, "doc_id long, text string"), **params
    )
    cols = ["term", "term_bucket", "part_id", "block_id", "n",
            "first_doc_id", "last_doc_id", "doc_ids_vb", "tfs_vb", "pos_vb"]
    got_rows = sorted(
        map(tuple, spark.read.parquet(path).select(cols).collect())
    )
    fresh_rows = sorted(map(tuple, fresh.select(cols).collect()))
    assert got_rows == fresh_rows
    assert len(got_rows) == info["n_runs_after"]

    # queries bit-exact across the compaction
    q_after = make_phrase_topk(
        load_positional_postings(spark, path), block_span=8, n_buckets=8
    )
    for ph in PHRASES:
        assert sorted(map(tuple, q_after(ph, 1000).collect())) == want[ph], ph
    assert sorted(map(tuple, q_after.near("table scan", 1000, 3).collect())) == want_near

    # meta healed and the index still appendable
    meta = load_positional_meta(path)
    assert meta["max_doc_id"] == max(d for d, _ in rows)
    extra = [(meta["max_doc_id"] + 1, "table scan table")]
    m2 = append_positional_postings(
        spark, path, spark.createDataFrame(extra, "doc_id long, text string")
    )
    assert m2["max_doc_id"] == extra[0][0]
    got = sorted(
        map(tuple, make_phrase_topk(
            load_positional_postings(spark, path), block_span=8, n_buckets=8
        )("table scan", 1000).collect())
    )
    assert any(r[1] == extra[0][0] for r in got), got  # (rank, doc_id, tf)

"""Streaming dedup (streaming/dedup.py): dropDuplicatesWithinWatermark
keeps exactly the first arrival per content digest across micro-batches
(batch twin defines winner semantics), and the state node is the
watermark-evicting dedup store (bounded state — the 100 TB property)."""

from __future__ import annotations

import datetime
import os

from local_search_engine_spark.streaming.dedup import dedup_stream, first_seen

SCHEMA = "doc_id long, text string, ts timestamp"
T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _rows(lo, hi, dup_of=None):
    """Docs lo..hi; content duplicates doc (i - dup_of) when given."""
    out = []
    for i in range(lo, hi):
        src = i - dup_of if dup_of else i
        out.append((i, f"content of {src} padded tokens", T0 + datetime.timedelta(minutes=i)))
    return out


def test_stream_dedup_matches_batch_twin(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    b1 = spark.createDataFrame(_rows(0, 30), SCHEMA)
    # docs 30..40 re-send the content of docs 0..10 at later event times;
    # docs 40..60 are fresh
    b2 = spark.createDataFrame(_rows(30, 40, dup_of=30) + _rows(40, 60), SCHEMA)
    # one file per drop + distinct mtimes + maxFilesPerTrigger=1 pins the
    # micro-batch order to arrival order (duplicates must arrive AFTER
    # their originals for the winner comparison to be deterministic).
    # mtimes are set EXPLICITLY via os.utime — a sleep-based gap flakes
    # on filesystems with coarse mtime granularity / CI clock skew
    b1.coalesce(1).write.mode("append").parquet(watch)
    for f in os.listdir(watch):
        if f.endswith(".parquet"):
            os.utime(os.path.join(watch, f), (1_700_000_000, 1_700_000_000))
    b2.coalesce(1).write.mode("append").parquet(watch)
    for f in os.listdir(watch):
        p = os.path.join(watch, f)
        if f.endswith(".parquet") and os.path.getmtime(p) != 1_700_000_000:
            os.utime(p, (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    q = (
        dedup_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["text_md5"]: r["doc_id"]
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    union = b1.unionByName(b2)
    twin = {r["text_md5"]: r["doc_id"] for r in first_seen(union).collect()}
    assert got == twin
    assert len(got) == 50  # 60 arrivals, 10 cross-batch dups dropped


def test_stream_dedup_state_is_watermark_evicting(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    spark.createDataFrame(_rows(0, 5), SCHEMA).write.mode("append").parquet(watch)
    stream = spark.readStream.schema(SCHEMA).parquet(watch)
    q = (
        dedup_stream(stream, watermark="1 hours")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the executed streaming plan must use the WITHIN-WATERMARK dedup
    # operator (evicting state), not the unbounded dropDuplicates store
    last = q.lastProgress
    assert last is not None
    op = (last.get("stateOperators") or [{}])[0].get("operatorName", "")
    assert "dedupeWithinWatermark" in op, op

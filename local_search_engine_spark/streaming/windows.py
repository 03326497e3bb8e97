"""Structured Streaming windowed aggregation — the canonical
watermark + event-time-window rollup a 100 TB event pipeline runs
continuously (the reference has no streaming at all; SURVEY.md §2.9 —
this is part of the engine's beyond-reference streaming surface next to
streaming/merge.py's ingest).

Shape: file/stream source → withWatermark(ts, horizon) → groupBy(
window(ts, len), keys) → count/sum. The watermark bounds the window
state Spark retains (late rows older than the horizon are dropped and
their windows finalized) — that is what makes the operator runnable
forever; without it, state grows with the stream. In `complete` output
mode (used by the bounded driver gate so every window emits
deterministically) the watermark does not gate emission — `append`
mode + a real trigger cadence is the production configuration.
"""

from __future__ import annotations

import uuid


def windowed_event_rollup(
    spark,
    source_dir: str,
    schema: str,
    window_len: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple = ("event_type",),
    output_mode: str = "complete",
):
    """Start an availableNow windowed-rollup stream into a memory sink;
    returns (StreamingQuery, sink_table_name). Caller awaits the query
    then reads spark.table(name): (window struct, *key_cols, n_events,
    sum_value)."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(source_dir)
    # watermarks require TIMESTAMP (not NTZ); the engine's convention is
    # naive == UTC (see fusion.temporal_flexible), so the cast is purely
    # a type promotion under a UTC session timezone
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        from pyspark.sql import functions as F2

        stream = stream.withColumn(ts_col, F2.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len), *key_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
    )
    name = "rollup_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    return q, name

"""Percolation CLI — standing phrase queries over a document directory
or stream (streaming/percolate.py).

Usage:
  # batch: match a parquet corpus once, print per-query hit counts
  python scripts/percolate.py --docs data/docs.parquet \
      --phrases '[[0, "merge shard"], [1, "fast scan"]]' [--out DIR]

  # streaming: watch a directory for new parquet files, write matches
  # to OUT as they arrive; --available-now drains what exists and stops
  # (deterministic mode for tests/CI), otherwise runs until killed
  python scripts/percolate.py --docs data/in_dir --stream --out data/hits \
      --phrases-file standing.json [--available-now]

--phrases is a JSON list of [query_id, phrase] pairs (or use
--phrases-file). With --bool each entry is instead a standing BOOLEAN
query in the full language of operators/boolquery.py ('"merge shard"~4
AND lang:python AND NOT /test_/'), matched index-free by
percolate_bool. The streaming mode is stateless (no watermark, no
state store): restart safety is the sink checkpoint + source offsets,
and throughput scales linearly with executors. spark-submit-shaped like
the sibling scripts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.session import get_spark
from local_search_engine_spark.streaming.percolate import (
    percolate,
    percolate_bool,
    percolate_bool_stream,
    percolate_stream,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--phrases", default=None, help="JSON [[id, phrase], ...]")
    ap.add_argument("--phrases-file", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--bool", dest="bool_mode", action="store_true",
                    help="entries are boolean queries (full query language)")
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    if args.phrases_file:
        with open(args.phrases_file) as f:
            phrases = [(int(q), str(t)) for q, t in json.load(f)]
    elif args.phrases:
        phrases = [(int(q), str(t)) for q, t in json.loads(args.phrases)]
    else:
        ap.error("one of --phrases / --phrases-file is required")

    spark = get_spark("percolate", cores=args.cores)
    t0 = time.time()

    if args.stream:
        if not args.out:
            ap.error("--stream requires --out")
        schema = spark.read.parquet(args.docs).schema
        stream = spark.readStream.schema(schema).parquet(args.docs)
        perc_s = percolate_bool_stream if args.bool_mode else percolate_stream
        matched = perc_s(
            stream, phrases, text_col=args.text_col, id_col=args.id_col
        )
        writer = (
            matched.writeStream.format("parquet")
            .option("path", args.out)
            .option("checkpointLocation", os.path.join(args.out, "_checkpoint"))
        )
        if args.available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            n = spark.read.parquet(args.out).count()
            print(json.dumps({"cmd": "percolate", "mode": "stream/availableNow",
                              "n_matches": int(n), "out": args.out,
                              "wall_sec": round(time.time() - t0, 2)}))
        else:
            q = writer.start()
            print(json.dumps({"cmd": "percolate", "mode": "stream/continuous",
                              "out": args.out, "query_id": q.id}))
            q.awaitTermination()
    else:
        from pyspark.sql import functions as F

        docs = spark.read.parquet(args.docs)
        perc_b = percolate_bool if args.bool_mode else percolate
        hits = perc_b(docs, phrases, text_col=args.text_col, id_col=args.id_col)
        if args.out:
            hits.write.mode("overwrite").parquet(args.out)
            hits = spark.read.parquet(args.out)
        counts = {
            int(r["query_id"]): int(r["n"])
            for r in hits.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        print(json.dumps({"cmd": "percolate", "mode": "batch",
                          "per_query_matches": counts,
                          "n_matches": int(sum(counts.values())),
                          "wall_sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

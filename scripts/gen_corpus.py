"""Generate the deterministic synthetic source-code corpus (FIXTURES.md).

Usage: python scripts/gen_corpus.py --sf 0.1 --out data/corpus_sf0.1 [--cores 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_search_engine_spark.session import get_spark
from local_search_engine_spark.sources.corpus import sf_rows, write_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    n = args.rows if args.rows is not None else sf_rows(args.sf)
    spark = get_spark("gen-corpus", cores=args.cores)
    t0 = time.time()
    write_corpus(spark, n, args.out)
    print(f"wrote {n} docs to {args.out} in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()

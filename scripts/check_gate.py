"""Local simulation of the driver's correctness gate: run every
__spark_entry__ queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir, compare row count, schema (sorted column names),
and order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.6f}".rstrip("0").rstrip(".") or "0"
    return str(val)


def rows_to_multiset(cols, rows):
    """Driver-faithful canonicalization (r05, VERDICT #2): the driver
    builds a pandas frame, orders columns by name, and pandas-sorts the
    rows over every column. Array/map/struct cells make pandas'
    hashtable-based sort raise TypeError — exactly the crash the driver
    records as a gate ERR — so this harness must crash the same way
    instead of silently stringifying the cell (the old str(val) canon
    let three array-typed gates ship green locally and err at the
    driver in r04)."""
    import pandas as pd

    df = pd.DataFrame(list(rows), columns=list(cols))
    df = df[sorted(df.columns)]
    # the driver's pandas sort: unhashable (list/dict/ndarray) cells
    # raise here, as they do in the driver's _canon
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    canoned = df.map(canon)
    return sorted("|".join(r) for r in canoned.itertuples(index=False, name=None))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    # data-derived oracles (chunk_split_separators VALUES literal) must
    # read the same sf dir the gates run against
    import os

    os.environ["LSE_ORACLE_SF_DIR"] = sf_dir

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("check_gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    import time

    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"WEAK {name}: no oracle, rows={len(srows)}")
            continue
        try:
            ddf = con.sql(sql)
            dcols = ddf.columns
            drows = ddf.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm = rows_to_multiset(scols, srows)
            dm = rows_to_multiset(dcols, drows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                only_s = [x for x in sm if x not in set(dm)][:3]
                only_d = [x for x in dm if x not in set(sm)][:3]
                problems.append(f"values differ; first diffs={diff} only_spark={only_s} only_duck={only_d}")
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

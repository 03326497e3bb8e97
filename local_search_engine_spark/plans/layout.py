"""Scale-adaptive input layout for expensive per-row kernels.

The classic input-skew failure (optimization guide §2.5): a corpus that
arrives as one unsplittable unit — a single-row-group Parquet file, one
gzip part, a tiny table AQE never needed to spread — scans as 1-2
partitions, and every Arrow kernel downstream (tokenize/hash/PDF/embed)
then runs on 1-2 cores of the whole cluster. The fix is the guide's:
"repartition immediately after the read", but ONLY when the input is
actually thin — a healthy 100 TB scan with thousands of splits must not
pay a full extra shuffle of the corpus.

`widen_for_kernel` is that conditional: shuffle-free plan + fewer scan
partitions than half the session's default parallelism → round-robin
repartition to default parallelism; anything else is returned untouched
(post-shuffle layouts are already spread by shuffle.partitions plus
AQE's parallelism-first coalescing). Callers apply it only where row
placement cannot change results: per-row kernels, integer/exact
aggregations, per-pair verification — never upstream of a float
aggregate whose summation order feeds a result (avgdl/avg_idf-style
scalars).
"""

from __future__ import annotations

import re

_SHUFFLE_EXCHANGE = re.compile(r"(?<!Broadcast)Exchange\s")


def widen_for_kernel(df, min_factor: int = 2):
    """Return `df`, round-robin repartitioned to the session default
    parallelism iff its physical plan is shuffle-free AND its scan
    yields fewer than defaultParallelism/min_factor partitions.

    The partition probe (`df.rdd.getNumPartitions`) is free exactly when
    the plan has no shuffle Exchange (no job is run to build the RDD),
    which is why the plan is string-checked first — probing a shuffled
    plan under AQE executes the upstream stages. Row-set identical by
    construction: repartition only moves rows."""
    try:
        # executedPlan, not sparkPlan: exchanges are inserted by the
        # EnsureRequirements preparation phase, so the pre-preparation
        # sparkPlan NEVER contains them and the guard would not fire.
        # Building executedPlan is planning only — no job runs.
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return df
    if _SHUFFLE_EXCHANGE.search(plan):
        return df
    sc = df.sparkSession.sparkContext
    target = int(sc.defaultParallelism)
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if parts * min_factor <= target:
        return df.repartition(target)
    return df

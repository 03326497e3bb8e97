"""SparkSession factory.

Local-mode defaults are sized for the sandbox (local[N], single JVM); on a
real cluster the same code runs via ``spark-submit --py-files engine.zip``
with executor-count-scaled shuffle partitions (see scripts/build_index.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile


def ship_package(spark) -> None:
    """Ship this package to executors — the local-mode equivalent of
    ``spark-submit --py-files engine.zip``. Without it, pandas-UDF /
    mapInPandas workers can't unpickle functions defined in this package
    when the driver's cwd isn't the repo root."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"lse_spark_pkg_{os.getpid()}"
    )
    archive = shutil.make_archive(zip_path, "zip", root_dir=root,
                                  base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(archive)


def get_spark(
    app_name: str = "local-search-engine-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",  # measured: a 48g heap is ~25% SLOWER than
    # 16g for the allocation-heavy tokenize scan in local mode (G1 region
    # count scales with heap); plenty for every SF this sandbox runs
    extra_conf: dict | None = None,
    executors: int | None = None,
    executor_memory_mb: int = 6144,
):
    """Create (or get) a SparkSession.

    cores: local[N] thread count; None → $SPARK_GRAFT_CPUS or all cores.
    shuffle_partitions defaults to the core count — the right size for
    local mode (the 200 default over-parallelizes small SFs); on a real
    cluster set it to ~2-3x total executor cores.

    executors: when set, use local-cluster[executors, cores, mem] —
    real separate executor JVMs on this machine. This is the faithful
    single-box emulation of an N-executor cluster: each executor has its
    own heap, so allocation/GC pressure does not compound across cores
    the way it does in one local[N] JVM (measured: the tokenize scan
    does not scale AT ALL inside one 32-thread JVM, but scales 3.1x
    from 2 to 8 separate 4-core executor JVMs). `cores` then means
    cores PER EXECUTOR; shuffle_partitions defaults to executors*cores.
    """
    from pyspark.sql import SparkSession

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if executors:
        master = f"local-cluster[{executors},{cores},{executor_memory_mb}]"
        total_cores = executors * int(cores)
    else:
        master = f"local[{cores}]"
        total_cores = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(total_cores, 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.executor.memory", f"{executor_memory_mb}m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE skew-join handles join-side skew at runtime; groupBy-side
        # hot-term skew is handled explicitly by doc-range sharding in
        # operators/build.py (SURVEY.md §4.2 "skew handling").
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        # cached-plan columnar compression (dictionary/RLE of millions of
        # term strings) measured 2.5x slower than raw caching on the tf
        # table; trade memory for CPU — index caches are short-lived
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        # wide aggregations (16-col MinHash, 60-col SimHash bit-sums)
        # must stay inside whole-stage codegen; the default 100-field cap
        # silently drops them to interpreted eval (measured 1.4x slower)
        .config("spark.sql.codegen.maxFields", "500")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    return spark

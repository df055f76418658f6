"""SparkSession factory tuned for both local testing and cluster scale.

Local mode (``local[N]``) is a single JVM; the same configs (AQE, shuffle
partitions sized to cores, Arrow for the Python boundary) are what we would
set on a 1000-executor cluster, where ``spark.sql.shuffle.partitions`` scales
with total cores and input size instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "doreisa_spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    - AQE on (runtime coalescing, skew-join splitting, local shuffle reader).
    - Arrow on for every Python<->JVM data transfer (pandas UDFs, toPandas).
    - Shuffle partitions sized to cores locally; on a real cluster this is
      overridden upward (AQE coalesces back down as needed).
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle (naive-UTC) exactly.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalesce floor (default 1 MB) is a BYTES heuristic: it
        # collapses any sub-32 MB shuffle to a handful of partitions, which
        # serializes CPU-dense post-shuffle operators (session_window's
        # merge ran 1.7-3.4 s of CPU on <=3 tasks over a 2.7 MB shuffle).
        # 64 KB keeps parallelismFirst's width for small-but-hot shuffles;
        # at cluster scale partitions are >> 1 MB and the floor never
        # binds, so this is scale-neutral (optimization guide §2.5 — the
        # hazard is a synthetic floor tuned to the wrong regime).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Generated-class cache (STATIC conf, default 100 entries): a
        # workload with >100 distinct WholeStageCodegen/expression units —
        # the 14-query bench alone has ~195; any real mixed analytics
        # deployment has far more — evicts and re-Janino-compiles ~190
        # units per pass (~5.6 ms each, measured: 576 recompiles across 3
        # bench passes, ~1 s/pass of pure compilation; 0 recompiles at
        # 4096). The cache keys generated SOURCE and holds compiled
        # classes — deterministic compiler memoization, never data. Memory
        # is bounded by the code cache (pre-sized to 512 MB below).
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # PySpark call-site capture (default on) wraps EVERY DataFrame/
        # Column op in a Python stack walk plus two extra py4j calls
        # (PySparkCurrentOrigin set/clear) purely to enrich error
        # messages with the user's line number. That is ~2× the py4j
        # round-trips per plan construction — measured 0.94 → 0.67 s of
        # summed build time across the 14 headline queries. Production
        # posture: off; flip on via extra_conf when chasing an error.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # write timestamps as TIMESTAMP_MICROS (the modern annotated
        # type), not legacy INT96: pyarrow cannot decode INT96 footer
        # min/max, which would silently disable sidecar data skipping
        # for every timestamp-keyed store (windowed views' retention
        # reads prune on exactly that column)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # events.parquet's ts encoding has drifted across testdata
        # generations (TIMESTAMP(NANOS) and plain timestamp[us]/NTZ);
        # catalog.table() normalizes both at runtime on any session, this
        # conf just lets the nanos variant load under the vectorized reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # pre-size the heap and JIT code cache: lazy heap growth causes
        # repeated full GCs at small committed sizes during the first
        # CPU-dense queries, and the md5/HOF-heavy generated code is large
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms4g -XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

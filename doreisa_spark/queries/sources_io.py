"""Source/sink round-trip queries — §2C row 1 (scans/sources/sinks).

Each query WRITES a benchmark table through a sink, reads it back through
the matching schema-explicit source, and aggregates; the DuckDB oracle
computes the same aggregate from the original parquet. A hash match
therefore proves the entire sink→source path is lossless, not just that
the reader parses.

Reference parity: the reference's only storage surface is the
``store_externally`` stub (doreisa/simulation_node.py:43,55); this is the
Spark-native realization SURVEY §2C scoped.

Sinks land in a PROCESS-LIFETIME temp directory (one per interpreter,
removed at exit): the written files must outlive the query function —
the returned read-back DataFrame is lazy and scans them at collect time
— so cleanup is tied to process exit, not query return. Separate
processes get separate directories, so concurrent gates at different
SFs never clobber each other, and repeated gate runs leave nothing
behind in the repo tree.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.registry import register
from doreisa_spark.sources import files as IO

_TMP = tempfile.mkdtemp(prefix="doreisa_io_")
atexit.register(shutil.rmtree, _TMP, ignore_errors=True)

_NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def _sink(sf_dir: str, name: str) -> str:
    return os.path.join(_TMP, os.path.basename(sf_dir.rstrip("/")), name)


@register(
    "source_csv_roundtrip",
    oracle="""
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
""",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → CSV sink → schema-explicit CSV source → aggregate.

    Exercises the text-format edge cases (string quoting, int parsing)
    against the original data: a value mangled anywhere in the round trip
    breaks the oracle hash."""
    n = table(spark, sf_dir, "nation")
    path = _sink(sf_dir, "nation_csv")
    IO.write_csv(n.select("n_nationkey", "n_name", "n_regionkey"), path)
    back = IO.read_csv(spark, path, _NATION_SCHEMA)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name")
    )


@register(
    "source_json_roundtrip",
    extended=True,
    oracle="""
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
""",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → JSON-lines sink → schema-explicit JSON source → aggregate."""
    n = table(spark, sf_dir, "nation")
    path = _sink(sf_dir, "nation_json")
    IO.write_json(n.select("n_nationkey", "n_name", "n_regionkey"), path)
    back = IO.read_json(spark, path, _NATION_SCHEMA)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name")
    )


@register(
    "sink_partitioned_parquet",
    extended=True,
    oracle="""
SELECT o_orderstatus, count(*) AS n_orders, sum(o_totalprice) AS revenue
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
""",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-PRUNED read-back.

    orders is laid out by o_orderpriority (low cardinality); the read-back
    filter on that column prunes directories at file-listing time — the
    scan plan shows PartitionFilters, and at 100 TB the excluded
    partitions cost zero I/O."""
    o = table(spark, sf_dir, "orders")
    path = _sink(sf_dir, "orders_by_priority")
    IO.write_parquet_partitioned(o, path, "o_orderpriority")
    back = IO.read_parquet(spark, path).where(F.col("o_orderpriority") == "1-URGENT")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("revenue")
    )


@register(
    "source_orc_roundtrip",
    extended=True,
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC sink → native ORC source → aggregate.

    The second columnar format next to parquet: same vectorized reader
    interface, pushdown, and pruning. The oracle aggregates the ORIGINAL
    parquet, so a value or type mangled anywhere in the ORC round trip
    (decimal/timestamp encoding differences are the classic hazards)
    breaks the hash."""
    c = table(spark, sf_dir, "customer")
    path = _sink(sf_dir, "customer_orc")
    IO.write_orc(c, path)
    back = IO.read_orc(spark, path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "source_bucketed_groupby",
    extended=True,
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY o_custkey
""",
)
def source_bucketed_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table layout: orders written ``bucketBy(8, o_custkey)``,
    read back through the catalog, aggregated on the bucket key.

    The payoff is the PLAN: a scan of a bucketed table already satisfies
    hash-distribution on the bucket key, so the groupBy runs with NO
    shuffle exchange (asserted in test_plan_shapes) — the pre-shuffled
    layout that makes repeated aggs/joins on the same key free at 100 TB.
    A second table bucketed the same way co-locates its join. The oracle
    aggregates the original parquet, proving the bucketed round trip
    lossless as well as shuffle-free."""
    import re as _re

    o = table(spark, sf_dir, "orders")
    tag = _re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))
    # deterministic name, no pid: the default catalog is per-process, so a
    # pid suffix only ever accumulated entries within long-lived sessions
    # (the round-3 "metastore litter"); same-name reruns just reuse it
    name = f"orders_bucketed_{tag}"
    if not spark.catalog.tableExists(name):
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .option("path", _sink(sf_dir, "orders_bucketed"))
            .saveAsTable(name)
        )
    back = spark.table(name)
    return back.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "sink_merge_upsert",
    extended=True,
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + 100 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 40 = 0
), inserts AS (
  SELECT 10000000 + r_regionkey AS c_custkey,
         'new_' || CAST(r_regionkey AS VARCHAR) AS c_name,
         CAST(r_regionkey AS BIGINT) AS c_nationkey,
         CAST(100 * r_regionkey AS DOUBLE) AS c_acctbal,
         'NEW' AS c_mktsegment
  FROM region
), merged AS (
  SELECT * FROM customer WHERE c_custkey % 40 <> 0
  UNION ALL SELECT * FROM updates
  UNION ALL SELECT * FROM inserts
)
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
FROM merged
GROUP BY c_mktsegment
""",
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) on a plain-parquet keyed table via DYNAMIC
    partition overwrite — the copy-on-write merge pattern Delta/Iceberg
    formalize, runnable on any object store:

    1. the base table lands partitioned by a key bucket;
    2. the merge writes ONLY the partitions containing matched keys
       (unmatched base rows of those partitions anti-joined back in) plus
       the partitions of inserted keys — `partitionOverwriteMode=dynamic`
       leaves every untouched partition byte-identical on disk;
    3. the read-back aggregate proves the merged table equals the
       logically-merged relation the oracle computes directly.

    At 100 TB this is the difference between rewriting the table and
    rewriting the few buckets a day's upserts touch; bucket count trades
    rewrite amplification against small-file pressure. Updated keys are
    c_custkey % 40 == 0 (these land in bucket 0 of 8, so exactly one base
    partition rewrites) and inserts are 5 fresh keys derived from region."""
    base = table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    base = base.select(*cols)
    path = _sink(sf_dir, "customer_merge")
    bucket = (F.col("c_custkey") % 8).alias("pbucket")

    base.withColumn("pbucket", bucket).write.mode("overwrite").partitionBy(
        "pbucket"
    ).parquet(path)

    updates = (
        base.where(F.col("c_custkey") % 40 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
    )
    r = table(spark, sf_dir, "region")
    inserts = r.select(
        (F.lit(10000000) + F.col("r_regionkey")).cast("long").alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("r_regionkey").cast("string")).alias("c_name"),
        F.col("r_regionkey").cast("long").alias("c_nationkey"),
        (100 * F.col("r_regionkey")).cast("double").alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    delta = updates.unionByName(inserts).withColumn("pbucket", bucket)

    stored = spark.read.parquet(path)
    affected = delta.select("pbucket").distinct()
    keep = stored.join(bcast(affected), "pbucket", "left_semi").join(
        delta.select("c_custkey"), "c_custkey", "left_anti"
    )
    with_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        keep.select(*cols, "pbucket").unionByName(
            delta.select(*cols, "pbucket")
        ).write.mode("overwrite").partitionBy("pbucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", with_mode)

    back = spark.read.parquet(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("balance"),
    )


@register(
    "source_schema_evolution",
    extended=True,
    oracle="""
WITH v1 AS (
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
), v2 AS (
  SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 10
), unioned AS (
  SELECT n_nationkey, n_name, NULL AS n_regionkey FROM v1
  UNION ALL SELECT * FROM v2
)
SELECT count(*) AS n_rows,
       count(n_regionkey) AS n_with_region,
       CAST(sum(COALESCE(n_regionkey, -1)) AS BIGINT) AS region_sum
FROM unioned
""",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a parquet dataset: generation 1 lands without a
    column, generation 2 adds it; a ``mergeSchema`` read reconciles both
    file schemas (old rows surface NULL for the new column) — the
    add-a-column migration every long-lived table goes through.

    Spark's default read takes ONE file's schema (whichever is sampled),
    silently dropping or failing on the other generation; mergeSchema is
    the correctness switch and costs a footer-union at planning time only
    — at 100 TB you pay it once per query plan, not per row."""
    n = table(spark, sf_dir, "nation")
    path = _sink(sf_dir, "nation_evolving")
    n.where(F.col("n_nationkey") < 10).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(path)
    n.where(F.col("n_nationkey") >= 10).select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_regionkey").alias("n_with_region"),
        F.sum(F.coalesce(F.col("n_regionkey"), F.lit(-1))).cast("bigint").alias(
            "region_sum"
        ),
    )


_COMPACT_FILES = 4


@register(
    "sink_compaction",
    extended=True,
    oracle="""
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY o_orderpriority
""",
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every
    object-store deployment schedules: a fragmented landing zone (64
    files here, the streaming-sink / tiny-batch symptom) is rewritten as
    {_COMPACT_FILES} right-sized files via repartition + overwrite, and
    the read-back aggregate proves bytes survived the rewrite.

    Why it matters at 100 TB: file-count, not byte-count, drives listing
    and task-scheduling overhead — a million 1 MB files costs more to
    plan than a thousand 1 GB files. The rewrite is one shuffle sized by
    the TARGET file count; tests/test_operators.py pins the physical
    file counts before/after."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    frag = _sink(sf_dir, "orders_fragmented")
    o.repartition(64).write.mode("overwrite").parquet(frag)
    compacted = _sink(sf_dir, "orders_compacted")
    spark.read.parquet(frag).repartition(_COMPACT_FILES).write.mode(
        "overwrite"
    ).parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )

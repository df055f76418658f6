"""Table catalog over the driver-generated parquet test data.

Reads are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / partition pruning against the files. At cluster
scale the same entry points read partitioned directories; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables whose downstream pipelines are CPU-dense (shingling, minhash,
# cosine folds) rather than scan-bound. At small SF these arrive as a
# single parquet row-group = 1 input split, which would serialize all the
# per-row compute onto one core; spread them across the cluster up front.
# On a real cluster the inputs arrive as many files and the repartition is
# a no-op (guarded below); Catalyst still pushes filters/pruning through
# the Repartition node.
_CPU_DENSE = frozenset({"documents", "embeddings", "events"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Column pruning + filter pushdown happen downstream.

    ``events.ts`` is TIMESTAMP(NANOS) in the files; Spark rejects that
    physical type unless ``spark.sql.legacy.parquet.nanosAsLong`` is set —
    and the conf must be set on WHATEVER session calls us (the external
    driver supplies its own), so it is applied here at runtime, not only in
    session.py. The long is then converted to a microsecond timestamp —
    lossless for this data (whole-microsecond values) and identical to what
    DuckDB's oracle sees."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer division — double division drifts ±1µs at 1e18 magnitudes
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if name in _CPU_DENSE:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

"""File sources & sinks — the engine's scan/sink surface beyond parquet.

The reference has only a stub for external storage
(doreisa/simulation_node.py:43,55 — ``store_externally`` is "TODO Not
implemented yet"); this module supplies the real thing the way a Spark
engine should: schema-EXPLICIT readers (schema inference reads the data
twice and guesses types — never acceptable on a 100 TB scan) and sinks
whose layout is a first-class query-planning input (a partitioned parquet
sink turns later predicate filters into partition pruning — directories
skipped at file-listing time, before any I/O).

All functions take/return plain DataFrames; the catalog stays the single
entry point for the benchmark tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan: self-describing schema, predicate pushdown and column
    pruning land in the reader (verify via PushedFilters/ReadSchema in
    ``.explain``)."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """CSV scan with an EXPLICIT schema (no inference pass over the data).

    header=false + known column order: the write side below is the
    producer, so the pairing is lossless for the supported types."""
    return spark.read.csv(path, schema=schema, header=False)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines scan with an EXPLICIT schema — on malformed rows Spark's
    default PERMISSIVE mode yields nulls rather than failing the scan."""
    return spark.read.json(path, schema=schema)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (header=false to match read_csv's explicit-schema pairing)."""
    df.write.mode("overwrite").csv(path, header=False)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """Hive-layout partitioned parquet sink: one directory per distinct
    value combination of ``cols``. Readers filtering on those columns
    prune whole directories (partition pruning — the scan never lists the
    excluded files). Choose low-cardinality columns; high-cardinality
    partitioning creates a small-file explosion at scale."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan: columnar like parquet, with the same pushdown/pruning
    behavior in Spark's native vectorized ORC reader."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)

"""Set-operation coverage: UNION ALL / UNION (distinct) / INTERSECT /
EXCEPT and their ALL (bag-semantics) variants.

Set ops in Spark are shuffle-on-all-columns (the distinct variants); at
scale prefer pre-projecting to the minimal column set first, as done here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.registry import register


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@register(
    "setop_union_all",
    # restored to the primary tier (r15 optimization round): the interrupted
    # build rotated this out for agg_retract_distinct, which left the
    # family-coverage test red and the declared set diverging from the
    # driver-verified r14 one; the r15 surfaces stay verified as extended
    oracle="""
SELECT nationkey, count(*) AS n
FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  UNION ALL
  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
)
GROUP BY nationkey
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle) + count per key."""
    return (
        _cust_nations(spark, sf_dir)
        .unionAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "setop_union_distinct", extended=True,
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
UNION
SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
""",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "setop_intersect",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_except",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "setop_except_all", extended=True,
    oracle="""
SELECT nationkey, count(*) AS n FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  EXCEPT ALL
  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
)
GROUP BY nationkey
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) — multiplicity-aware."""
    return (
        _cust_nations(spark, sf_dir)
        .exceptAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "setop_intersect_all", extended=True,
    oracle="""
SELECT nationkey, count(*) AS n FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  INTERSECT ALL
  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
)
GROUP BY nationkey
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection) — multiplicity-aware."""
    return (
        _cust_nations(spark, sf_dir)
        .intersectAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )

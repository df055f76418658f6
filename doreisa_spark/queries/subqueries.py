"""Subquery patterns: IN / NOT IN / EXISTS (semi/anti joins), scalar
subqueries (broadcast join against a 1-row aggregate), and correlated
aggregate subqueries (decorrelated to a join against a grouped aggregate —
exactly what Catalyst's decorrelation does, written explicitly here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.registry import register


@register(
    "subq_in",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderstatus = 'O'
""",
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join against a filtered dim."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "MACHINERY")
    return (
        o.join(bcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "subq_not_exists", extended=True,
    oracle="""
SELECT p_partkey, p_brand
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 10
)
""",
)
def subq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS with correlated predicate → left-anti join."""
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 10)
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select("p_partkey", "p_brand")


@register(
    "subq_scalar",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS quantity
FROM lineitem
WHERE l_quantity > 1.5 * (SELECT avg(l_quantity) FROM lineitem)
""",
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → broadcast cross-join of a 1-row agg
    (no driver round-trip: the threshold never leaves the cluster)."""
    l = table(spark, sf_dir, "lineitem")
    avg_qty = l.agg(F.avg("l_quantity").alias("__avg_qty"))
    return (
        l.crossJoin(bcast(avg_qty))
        .where(F.col("l_quantity") > 1.5 * F.col("__avg_qty"))
        .select("l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("quantity"))
    )


@register(
    "subq_correlated_agg",
    oracle="""
SELECT l.l_orderkey, l.l_partkey, round(l.l_quantity, 2) AS quantity
FROM lineitem l
WHERE l.l_quantity < 0.5 * (
  SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
""",
)
def subq_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (TPC-H Q17 pattern), decorrelated to a
    join with a per-key aggregate — one shuffle on l_partkey."""
    l = table(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        l.join(per_part, l.l_partkey == per_part.pk)
        .where(F.col("l_quantity") < 0.5 * F.col("__avg_qty"))
        .select("l_orderkey", "l_partkey", F.round("l_quantity", 2).alias("quantity"))
    )


@register(
    "subq_in_spark_sql", extended=True,
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders
  GROUP BY o_custkey
  HAVING count(*) >= 15
)
""",
)
def subq_in_spark_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same subquery expressed through spark.sql (parser + analyzer path)
    with HAVING — proves the SQL front-end, not just the DataFrame DSL."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_sq
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders_sq
          GROUP BY o_custkey
          HAVING count(*) >= 15
        )
        """
    )

"""Flagship multi-operator analytic queries (TPC-H-shaped).

These exercise the full scan → filter(pushdown) → join(broadcast/shuffle) →
partial+final agg → sort/limit pipeline. Aggregate outputs are rounded on
BOTH sides (Spark and the DuckDB oracle) so order-of-summation float noise
cannot flip the value hash.

Scale notes (100 TB posture): every join here is either broadcast (dims:
region/nation/customer/supplier/part all ≪ executor memory at any SF) or a
shuffle join on the natural key with AQE handling skew; aggregations are
partial+final (map-side combine) automatically via Catalyst hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.registry import register

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 6)                                        AS avg_qty,
  round(avg(l_extendedprice), 6)                                   AS avg_price,
  round(avg(l_discount), 6)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide hash aggregate with 8 aggregates over filtered lineitem.

    Catalyst compiles this to a partial+final HashAggregate with the shipdate
    predicate pushed into the parquet scan (verified via .explain: PushedFilters).
    """
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + global top-10 (deterministic tie-break).

    Selectivity-first join shape, the reduction a CBO would derive: a
    broadcast SEMI-join pushes the customer('BUILDING') filter onto
    orders BEFORE the fact-fact join (map-side, ~5x fewer orders rows at
    zero shuffle), then lineitem joins the reduced orders, then the
    surviving rows attach customer attributes (here: none needed beyond
    the filter, so the semi-join IS the customer join). Formulated as
    left_semi deliberately — an INNER o⨝c first gave Catalyst a
    product-blowup size estimate for the join output and it responded by
    broadcasting LINEITEM (measured 3.0 s vs 1.3 s at sf1); the semi
    output's estimate stays ≤ orders, so the planner keeps the sane
    build side at every scale. Measured min-of-3 idle: sf1 1.3 s (parity
    with the naive order), sf10 3.3 s vs naive 4.7 s.
    The LIMIT is an order-by-limit (TakeOrderedAndProject) — no full sort
    at scale.
    """
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    o_building = o.join(
        bcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_semi"
    )
    return (
        l.join(o_building, l.l_orderkey == o_building.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q5_ORACLE = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", extended=True, oracle=Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join through the full star schema.

    region/nation/supplier/customer are broadcast; only orders⨝lineitem
    shuffles. The c_nationkey = s_nationkey condition rides on the supplier
    join (composite equi-join), not a post-filter.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .join(
            bcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .join(bcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", extended=True, oracle=Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+scalar-agg — the pushdown benchmark.

    All four predicates reach the parquet reader (PushedFilters); only two
    columns are read (ReadSchema pruning). One-row global aggregate.
    """
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  round(c_acctbal, 2) AS acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", extended=True, oracle=Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top-20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .join(bcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q14_ORACLE = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
"""


@register("q14_promo_effect", extended=True, oracle=Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio after a broadcast join.

    part broadcasts; the shipdate range predicate pushes into the lineitem
    scan, so the join input is already pruned at the file reader."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0)
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01 00:00:00").cast("timestamp"))
        )
        .join(bcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_revenue_pct")
        )
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("q4_priority_check", extended=True, oracle=Q4_ORACLE)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated semi-join + count by priority.

    (Adapted: the synthetic lineitem has no commit/receipt dates, so the
    late-line predicate is shipdate > orderdate + 60 days.) Catalyst plans
    the EXISTS as a left-semi hash join on orderkey with the date theta
    condition evaluated join-side — orders is never duplicated by multi-line
    matches, so the count stays per-order at any SF."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", extended=True, oracle=Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional two-nation trade volume by ship year.

    The nation pair predicate is a DISJUNCTION across two different join
    branches (supplier's nation × customer's nation) — it cannot push into
    either scan alone, so it lands as a post-join filter over broadcast
    dims. lineitem⨝orders is the only shuffle; both nation joins and
    supplier/customer broadcast."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(bcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(bcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(bcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(bcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register("q17_small_quantity", extended=True, oracle=Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar-aggregate subquery against the fact
    table itself (small-quantity revenue below 20% of the part's average).

    Decorrelated by hand the way Catalyst would: one partial+final agg
    builds the per-part average (narrow (partkey, threshold) frame), which
    then BROADCASTS back onto the brand-filtered fact rows — the fact table
    is scanned twice but never shuffled, and the brand predicate pushes
    into its second scan."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    thresholds = (
        l.join(bcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        l.join(bcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(bcast(thresholds), F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_bracket_revenue", extended=True, oracle=Q19_ORACLE)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets spanning both
    join sides (brand/size from part × quantity from lineitem).

    (Adapted: no container/shipmode columns in the synthetic schema.)
    Catalyst extracts the common single-side residuals — p_brand IN (...)
    prunes the broadcast build side and l_quantity BETWEEN 1 AND 30 pushes
    into the fact scan — before evaluating the full OR join-side; the join
    itself stays a plain broadcast equi-join on partkey."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(bcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(bracket)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q18_ORACLE = """
SELECT c_custkey, o_orderkey, o_orderdate, round(total_qty, 2) AS total_qty
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_orderdate,
         sum(l_quantity) AS total_qty
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_custkey, o_orderkey, o_orderdate
)
WHERE total_qty > 150
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_orders", extended=True, oracle=Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-filter (HAVING) + global top-N.

    The HAVING threshold filters AFTER the hash aggregate (Catalyst keeps
    the agg partial+final); the final LIMIT is TakeOrderedAndProject —
    no global sort materializes at scale."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_orderdate"
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
        .select("c_custkey", "o_orderkey", "o_orderdate", F.round("total_qty", 2).alias("total_qty"))
    )


SORT_ORACLE = """
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
FROM customer
ORDER BY c_acctbal, c_custkey
"""


@register("sort_global_range", extended=True, oracle=SORT_ORACLE)
def sort_global_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TOTAL ordering (no limit): Spark samples the sort key,
    range-partitions (Exchange rangepartitioning — never a single
    partition), and sorts each range locally; ranges concatenate into the
    global order. This is the full-table sort a sharded export runs at
    100 TB; the top-k path (q3/q10) never needs it."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    ).orderBy("acctbal", "c_custkey")


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23'
  AND p_type <> 'SMALL'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%5%')
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_cnt", extended=True, oracle=Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp folded onto lineitem — this schema has no
    partsupp table): per part-attribute distinct-supplier counts with a
    NOT IN suppression list.

    Plan: the suppression list is a tiny broadcast anti join (never a
    shuffle); part is a broadcast dim; the only shuffle is the distinct
    aggregation keyed by the group columns — partial+final with the
    distinct expand, the standard Catalyst lowering."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "SMALL")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_name").like("%5%")).select(
        "s_suppkey"
    )
    return (
        l.join(bcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(bcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q21_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
), order_stats AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM li
JOIN order_stats USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q21_waiting_supplier", extended=True, oracle=Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt/commit dates folded to shipdate-vs-order
    lag): suppliers who were the SOLE late shipper on multi-supplier
    finished orders.

    The classic EXISTS + NOT EXISTS double self-join is lowered to one
    per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back on orderkey — two shuffles on the same key instead of
    three self-join shuffles, and AQE can co-locate them. The supplier
    name join is broadcast; final top-20 is TakeOrderedAndProject."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    li = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        li.join(stats, "l_orderkey")
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(bcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


Q22_ORACLE = """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment AS segment,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
  )
GROUP BY c_mktsegment
"""


@register("q22_sales_opportunity", extended=True, oracle=Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (every customer here has some order, so the dormancy window
    replaces the original's no-orders-at-all), grouped by segment.

    Plan: the global average is a 1-row scalar broadcast; the dormancy
    check is an anti join against date-filtered orders (filter pushed to
    the scan, join keyed on custkey); final agg is a tiny groupBy over
    segments."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(bcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       n_name AS supp_nation,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
JOIN customer ON c_custkey = o_custkey
WHERE r_name = 'EUROPE'
  AND c_mktsegment = 'AUTOMOBILE'
GROUP BY 1, 2
"""


@register("q8_market_share", extended=True, oracle=Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year supplier-nation revenue inside one
    region/segment — the national-market-share numerator (the original's
    share ratio is one exact division over these grouped sums; comparing
    the sums keeps the oracle on the rounded-big-SUM convention).

    Plan: all five dims broadcast; the single shuffle is
    lineitem⨝orders on orderkey feeding the (year, nation) hash
    aggregate.

    Revenue sums in DECIMAL scale 4, then casts to double UNROUNDED
    (identical decimals -> identical doubles -> identical rendering):
    prices/discounts are exact 2dp by construction, so the per-group sum
    is order-independent-exact and bit-identical in both engines. The
    usual round(double, 2) display would reintroduce the half-tie
    divergence (observed at sf0.001: an exact ...315 group rendered .32
    by Spark's HALF_UP-on-shortest-decimal and .31 by DuckDB's
    double-nearest)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "AUTOMOBILE")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(s), l.l_suppkey == s.s_suppkey)
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .join(bcast(r), n.n_regionkey == r.r_regionkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("n_name").alias("supp_nation"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q12_priority_lines", extended=True, oracle=Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode folded to linestatus — this schema has no
    l_shipmode/receipt dates): per-status counts of high- vs low-priority
    order lines shipped in one year.

    Plan: the date predicate is pushed to the lineitem scan; one
    orderkey shuffle join; conditional aggregation is a single
    partial+final pass."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
                   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("q13_customer_distribution", extended=True, oracle=Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer-order-count distribution — outer join with
    a join-condition filter, then agg-of-agg (count per customer →
    histogram of counts).

    Plan: one custkey shuffle for the outer join + first agg; the second
    agg groups a customer-cardinality input down to a handful of rows —
    AQE coalesces it to near-zero cost."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", extended=True, oracle=Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the top supplier by quarterly revenue — a reused
    aggregate (the revenue "view") consumed twice: once for the scalar
    max, once for the equality filter. Revenue is rounded to 2dp BEFORE
    the max comparison in both engines, so the tie set is identical.

    Plan: one suppkey shuffle builds the revenue aggregate; the scalar
    max broadcasts back over it; the supplier dim is broadcast."""
    l = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(bcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(bcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q2 / Q9 / Q11 / Q20 shapes — the four TPC-H queries whose original text
# needs PARTSUPP, which this testdata universe does not ship. The shape
# variants derive the part-supplier catalog from lineitem instead:
# ps(partkey, suppkey, cost=min extendedprice, availqty=sum quantity) —
# preserving each query's distinctive plan shape (correlated min over a
# derived relation, profit arithmetic over a 6-way join, HAVING over a
# scalar aggregate of the same subtree, semi-join on an excess predicate).
# cost/availqty are cast DECIMAL(18,2) from exact-2dp / integral doubles,
# so all downstream arithmetic follows the q8 decimal-exact convention
# (sum order cannot perturb the hash).

PS_SQL = """
ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS ps_cost,
         CAST(sum(l_quantity) AS DECIMAL(18,2)) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


def _ps_view(l: DataFrame) -> DataFrame:
    """The derived part-supplier catalog (see PS_SQL)."""
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min("l_extendedprice").cast("decimal(18,2)").alias("ps_cost"),
        F.sum("l_quantity").cast("decimal(18,2)").alias("ps_availqty"),
    )


Q2_ORACLE = f"""
WITH {PS_SQL}, eligible AS (
  SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name, ps.ps_cost
  FROM part p
  JOIN ps ON ps.ps_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_size <= 15 AND p.p_type = 'ECONOMY'
)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
       CAST(ps_cost AS DOUBLE) AS min_cost
FROM (SELECT e.*, min(ps_cost) OVER (PARTITION BY p_partkey) AS mc FROM eligible e)
WHERE ps_cost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", extended=True, oracle=Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every ECONOMY part in one region, the
    supplier(s) offering the minimum derived cost — the original's
    correlated-min-subquery answered as a window min over the eligible
    set (same semantics, one pass instead of a re-join).

    Plan: part/supplier/nation/region broadcast; ONE shuffle builds the
    derived ps catalog (map-side combined groupBy); the min-cost filter
    is a window over the already-partitioned eligible rows. DECIMAL cost
    equality makes the correlated comparison exact. LIMIT rides a total
    order (acctbal desc, nation, supplier, part), so the cut is
    deterministic."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window as W

    eligible = (
        _ps_view(l)
        .join(bcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(bcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .join(bcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "ps_cost")
    )
    mc = F.min("ps_cost").over(W.partitionBy("p_partkey"))
    return (
        eligible.withColumn("mc", mc)
        .where(F.col("ps_cost") == F.col("mc"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("ps_cost").cast("double").alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q9_ORACLE = f"""
WITH {PS_SQL}
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - ps_cost * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


@register("q9_product_profit", extended=True, oracle=Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over the
    parts matching a name pattern — revenue minus derived-cost x quantity
    through a six-way join.

    Plan: part (name-filtered, broadcast), supplier/nation broadcast; the
    ps catalog reuses the lineitem shuffle key (partkey, suppkey); orders
    joins on orderkey; final (nation, year) hash agg is map-side partial.
    All money arithmetic stays DECIMAL until the final cast, so per-group
    sums are order-independent-exact in both engines (q8 convention)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("ps_cost") * F.col("l_quantity").cast("decimal(18,2)")
    return (
        l.join(
            _ps_view(l),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(bcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(bcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(bcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


Q11_ORACLE = f"""
WITH {PS_SQL}, natsupp AS (
  SELECT ps_partkey, ps_cost * ps_availqty AS val
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey AS p_partkey, CAST(sum(val) AS DOUBLE) AS value
FROM natsupp
GROUP BY 1
HAVING CAST(sum(val) AS DOUBLE) * 1000 > (SELECT CAST(sum(val) AS DOUBLE) FROM natsupp)
"""


@register("q11_important_stock", extended=True, oracle=Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose derived inventory value within one
    nation exceeds a fraction of that nation's total — the
    HAVING-over-scalar-subquery pattern where the threshold aggregates
    the SAME subtree the groups come from.

    Plan: the natsupp subtree computes once per side; Spark broadcasts
    the one-row total and filters post-agg (no second scan of lineitem —
    the ps aggregate feeds both). Per-part values stay DECIMAL-exact;
    only the threshold comparison is double (an inclusion flip would
    need a group to land within one ulp of total/1000 — not a value
    divergence, and no such boundary case exists in the data)."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    natsupp = (
        _ps_view(l)
        .join(bcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .select("ps_partkey", (F.col("ps_cost") * F.col("ps_availqty")).alias("val"))
    )
    per_part = natsupp.groupBy(F.col("ps_partkey").alias("p_partkey")).agg(
        F.sum("val").alias("val_sum")
    )
    total = natsupp.agg(F.sum("val").cast("double").alias("total"))
    return (
        per_part.crossJoin(bcast(total))
        .where(F.col("val_sum").cast("double") * 1000 > F.col("total"))
        .select("p_partkey", F.col("val_sum").cast("double").alias("value"))
    )


Q20_ORACLE = f"""
WITH {PS_SQL}, shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS q96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT DISTINCT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM ps
  JOIN part ON p_partkey = ps_partkey
  LEFT JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE p_name LIKE 'small%'
    AND CAST(ps_availqty AS DOUBLE) > 2 * COALESCE(q96, 0)
)
"""


@register("q20_excess_suppliers", extended=True, oracle=Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess derived availability
    (total > 2x the 1996 shipped quantity) of any 'small*' part — the
    nested semi-join pattern (IN over a filtered join with an outer
    quantity comparison).

    Plan: part broadcast into the ps subtree; shipped reuses the
    (partkey, suppkey) shuffle key; the eligible-supplier set is LEFT
    SEMI joined (never multiplies supplier rows). Quantity sums are
    integral doubles — comparisons exact."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    shipped = (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q96"))
    )
    excess = (
        _ps_view(l)
        .join(bcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        .where(
            F.col("ps_availqty").cast("double")
            > 2 * F.coalesce(F.col("q96"), F.lit(0.0))
        )
        .select("ps_suppkey")
    )
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .distinct()
    )

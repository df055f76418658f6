"""Window-function coverage: ranking, analytic (lag/lead/first/last),
running/moving frames (ROWS and RANGE), ntile/percent_rank/cume_dist,
and top-k per group.

Every orderBy below includes a unique tie-break key so results are
deterministic (row_number over a non-total order is not). One shuffle per
distinct partitioning; Catalyst chains same-partitioning windows into one
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.topk import topk_per_group
from doreisa_spark.registry import register


@register(
    "window_ranking",
    oracle="""
SELECT c_nationkey, c_custkey,
       round(c_acctbal, 2) AS acctbal,
       row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk,
       dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drk
FROM customer
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation by balance."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@register(
    "window_running_sum", extended=True,
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order history (ROWS frame)."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "window_lag_lead",
    # rotated to extended in r14 to stay inside the driver's 50-entry
    # primary budget when agg_retract_incremental joined: the window
    # family keeps ranking/range_frame/topk_per_group primary, and
    # lag/lead stays hash-gated by the local full-registry run
    extended=True,
    oracle="""
SELECT user_id, event_id,
       round(value, 2) AS value,
       round(lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
       round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value,
       CAST(date_diff('second',
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT)
         AS secs_since_prev
FROM events
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation and inter-event gap per user."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("secs_since_prev"),
    )


@register(
    "window_moving_avg", extended=True,
    oracle="""
SELECT user_id, event_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_3,
       round(max(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 2) AS mov_max_5
FROM events
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frames: trailing 3-row average, centered 5-row max."""
    ev = table(spark, sf_dir, "events")
    ordering = [F.col("ts"), F.col("event_id")]
    w3 = W.partitionBy("user_id").orderBy(*ordering).rowsBetween(-2, 0)
    w5 = W.partitionBy("user_id").orderBy(*ordering).rowsBetween(-2, 2)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w3), 6).alias("mov_avg_3"),
        F.round(F.max("value").over(w5), 2).alias("mov_max_5"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS totalprice,
       count(*) OVER (
         ORDER BY o_totalprice
         RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k_below
FROM orders
WHERE o_orderstatus = 'P'
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: orders within $1000 below.

    A naive ``W.orderBy(price)`` is unpartitioned — WindowExec moves ALL
    rows to one task, a scale-killer. Instead the ordering axis is cut
    into frame-width buckets (``floor(price/1000)``): a trailing frame of
    width 1000 can only reach into the row's own bucket and the one below,
    so each row is shuffled to its own bucket and to bucket+1 (as frame
    context), the window runs partitioned by bucket, and only the home
    copy is emitted. 2× the rows through the shuffle, but every partition
    is bounded by the value-density of one $1000 band — the same plan
    works unchanged at 100 TB (and generalizes: bucket width = frame
    width for any trailing RANGE frame).
    """
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_totalprice")
    )
    b = o.withColumn("bucket", F.floor(F.col("o_totalprice") / F.lit(1000.0)))
    home = b.withColumn("part", F.col("bucket"))
    ctx = b.withColumn("part", F.col("bucket") + F.lit(1))
    # integral frame bounds: py4j only routes (long, long); Spark widens to
    # the double ordering column, same value-range semantics as the oracle
    w = W.partitionBy("part").orderBy("o_totalprice").rangeBetween(-1000, W.currentRow)
    return (
        home.unionAll(ctx)
        .withColumn("n_within_1k_below", F.count(F.lit(1)).over(w))
        .where(F.col("part") == F.col("bucket"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "n_within_1k_below",
        )
    )


@register(
    "window_distribution", extended=True,
    oracle="""
SELECT c_custkey, c_mktsegment,
       ntile(4)       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile,
       round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6)
         AS pct_rank,
       round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6)
         AS cdist
FROM customer
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist distribution functions."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "window_first_last", extended=True,
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit full-partition frame."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@register(
    "window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer)
WHERE rk <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation (operators/topk.py).

    At scale Catalyst inserts a per-partition rank-limit before the shuffle
    (WindowGroupLimit), so the exchange carries ≤k rows per group per task.
    """
    c = table(spark, sf_dir, "customer")
    ranked = topk_per_group(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        3,
        rank_col="rk",
    )
    return ranked.select(
        "c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rk"
    )


@register(
    "window_ntile",
    extended=True,
    oracle="""
SELECT o_orderpriority, quartile,
       count(*) AS n,
       CAST(min(o_orderkey) AS BIGINT) AS first_key
FROM (
  SELECT o_orderpriority, o_orderkey,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders)
GROUP BY o_orderpriority, quartile
""",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile bucketing within each order priority — the
    equal-height binning shape (price-tier assignment). The window is
    PARTITIONED (never all-to-one) and its order is total
    (totalprice, orderkey), so bucket boundaries are deterministic in
    both engines; the output aggregates per-bucket stats."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").cast("bigint").alias("first_key"),
        )
    )

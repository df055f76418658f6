"""Aggregation coverage: hash agg (partial+final), distinct, approximate
sketches, rollup/cube/grouping sets, pivot, statistical aggregates, exact
percentiles, conditional aggregation, and Pandas-UDF grouped aggregation.

All Catalyst hash aggregates are partial+final automatically (map-side
combine), so at 100 TB the shuffle carries only group keys × partial states.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import column_minmax, table
from doreisa_spark.registry import register


@register(
    "agg_count_distinct",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase agg in Catalyst)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "agg_approx_count_distinct",
    extended=True,
    band_oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS approx_parts,
       count(DISTINCT l_orderkey) AS approx_orders
FROM lineitem
GROUP BY l_returnflag
""",
    band_rtol=0.05,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch — algorithm-specific values, so no
    exact-hash oracle; the band oracle pins each estimate within ±5% of the
    exact distinct count (HLL at rsd=0.01 lands well inside). The scale
    path for 100 TB distincts: fixed-size sketch per partition, merged,
    no expand."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
    )


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag, status), (flag), ()."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_cube", extended=True,
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(avg(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


@register(
    "agg_grouping_sets", extended=True,
    oracle="""
SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via Spark SQL — same Catalyst Expand plan)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_pivot",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot orderstatus into columns (compiles to conditional aggregation)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "agg_stats", extended=True,
    oracle="""
SELECT c_mktsegment,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(avg(c_acctbal), 6) AS avg_bal,
       round(stddev_samp(c_acctbal), 6) AS std_bal,
       round(var_samp(c_acctbal), 4) AS var_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass moment computation)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        F.round(F.stddev_samp("c_acctbal"), 6).alias("std_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
    )


@register(
    "agg_percentiles", extended=True,
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(median(l_quantity), 6) AS med_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The approx scale path is agg_approx_percentiles."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75"),
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
    )


@register(
    "agg_approx_percentiles",
    extended=True,
    band_oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS approx_p50
FROM lineitem
GROUP BY l_returnflag
""",
    band_rtol=0.05,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles — sketch-based, so no
    exact-hash oracle; the band oracle pins the estimate within ±5% of the
    exact interpolated median (GK at accuracy=1000 bounds rank error to
    1/1000, far tighter in value space on this data). Fixed memory per
    partition + merge: the 100 TB path."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("approx_p50")
    )


@register(
    "agg_conditional", extended=True,
    oracle="""
SELECT l_linestatus,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2)
         AS returned_price,
       round(avg(CASE WHEN l_quantity >= 25 THEN l_extendedprice END), 6)
         AS avg_price_bulk
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER / CASE-gated sums and avgs."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("returned_price"),
        F.round(
            F.avg(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))), 6
        ).alias("avg_price_bulk"),
    )


@register(
    "agg_min_max_by", extended=True,
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey, o_totalprice) AS most_expensive_order,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (arg-max aggregation) — single-pass, no join-back.

    Note: o_totalprice has no duplicate values per group in this dataset
    (continuous doubles), so arg extremes are deterministic."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("most_expensive_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
    )


@register(
    "agg_pandas_udaf",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDF (Arrow-vectorized UDAF): weighted average.

    Python is the slow path — this exists to prove the UDAF surface; the
    oracle shows the built-in formulation Catalyst would prefer."""

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
        return float((price * qty).sum() / qty.sum())

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "weighted_avg_price"
        )
    )


@register(
    "agg_unpivot",
    extended=True,
    oracle="""
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of agg_pivot: wide numeric columns to
    long (key, metric, value) rows, the shape feature stores and metric
    pipelines ingest. Spark compiles ``unpivot`` to a map-only Expand
    (each input row emits one row per value column) — no shuffle, no
    UNION-induced double scan; values coerce to the common double type."""
    p = table(spark, sf_dir, "part")
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "agg_histogram",
    extended=True,
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS INTEGER) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket-by-expression groupBy — the
    distributed histogram every profiling/quality pass runs. One
    partial+final hash agg; bucket ids are exact integer floors so the
    engines can't disagree at bin edges."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "agg_mode",
    extended=True,
    oracle="""
SELECT o_orderpriority, o_orderstatus AS modal_status, n FROM (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY count(*) DESC, o_orderstatus) AS rk
  FROM orders
  GROUP BY o_orderpriority, o_orderstatus)
WHERE rk = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal (most frequent) order status per priority — the mode
    aggregate via count + deterministic argmax (ties break on the status
    value, identical in both engines). Two narrow hash aggregates
    sharing the priority key; the window ranks only one row per
    (priority, status) pair."""
    o = table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("modal_status"), "n")
    )


@register(
    "agg_rollup_incremental",
    oracle="""
SELECT event_type,
       cnt,
       round(sum_value, 2) AS sum_value,
       min_value, max_value
FROM (
  SELECT event_type, count(*) AS cnt, sum(value) AS sum_value,
         min(value) AS min_value, max(value) AS max_value
  FROM events GROUP BY event_type)
""",
)
def agg_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-incremental materialized aggregate ≡ the batch GROUP
    BY (streaming/incremental_agg.py): events split into three
    event_id ranges ingested as micro-batches — each commits only its
    PARTIAL per-type aggregate through the exactly-once log — and the
    merged view must hash-match DuckDB aggregating the raw table in
    one pass. Proves the distributive-merge algebra (sum/count by SUM,
    min/max by MIN/MAX) and, because commits refuse redelivered batch
    ids, that a replayed micro-batch cannot double-count."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = AggregateStore(
        spark, _fresh_store_dir("incagg"), key_cols=["event_type"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value"),
              "min_value": ("min", "value"), "max_value": ("max", "value")},
    )
    for cond in (
        F.col("event_id") <= cut1,
        (F.col("event_id") > cut1) & (F.col("event_id") <= cut2),
        F.col("event_id") > cut2,
    ):
        store.process_batch(e.where(cond))
    return store.read().withColumn("sum_value", F.round("sum_value", 2))


@register(
    "agg_rollup_incremental_lookup",
    extended=True,
    oracle="""
SELECT user_id, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT user_id, count(*) AS cnt, sum(value) AS sum_value
  FROM events GROUP BY user_id)
WHERE user_id BETWEEN 3 AND 7
""",
)
def agg_rollup_incremental_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed lookup into the materialized view under the gate: the
    per-user store commits partials SORTED by user_id with key-range
    sidecars, and the range read (prune_between + the row predicate)
    merges only the partial dirs/files whose recorded range overlaps
    [3, 7] — r12 directory-level skipping exercised end-to-end against
    DuckDB's answer over the raw table."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut = lo + (hi - lo) // 2
    store = AggregateStore(
        spark, _fresh_store_dir("incagglk"), key_cols=["user_id"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
    )
    store.process_batch(e.where(F.col("event_id") <= cut))
    store.process_batch(e.where(F.col("event_id") > cut))
    return (
        store.read(prune_between={"user_id": (3, 7)})
        .where(F.col("user_id").between(3, 7))
        .withColumn("sum_value", F.round("sum_value", 2))
    )


@register(
    "agg_distinct_incremental",
    extended=True,
    band_oracle="""
SELECT event_type, count(DISTINCT user_id) AS approx_users,
       count(*) AS cnt
FROM events GROUP BY event_type
""",
    band_rtol=0.05,
)
def agg_distinct_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approx-distinct in the incremental materialized view:
    exact COUNT(DISTINCT) is not distributive, but an HLL register
    vector is (merge = element-wise MAX), so the store keeps a
    map<register, rho> sketch per group per batch — integer-only
    xxhash64/bit_count partials, no floats until the final estimator —
    and the merged view's estimate must land within ±5% of DuckDB's
    exact distinct over the raw table (4096 registers, rsd ~1.6%;
    small groups hit the linear-counting range and come out exact).
    The 100 TB path for incremental distincts: fixed-size sketches per
    batch, never a re-scan, never an expand."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = AggregateStore(
        spark, _fresh_store_dir("incdist"), key_cols=["event_type"],
        aggs={"approx_users": ("hll", "user_id"),
              "cnt": ("count", None)},
    )
    for cond in (
        F.col("event_id") <= cut1,
        (F.col("event_id") > cut1) & (F.col("event_id") <= cut2),
        F.col("event_id") > cut2,
    ):
        store.process_batch(e.where(cond))
    return store.read()


@register(
    "agg_quantile_incremental",
    extended=True,
    band_oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS q_0_5,
       quantile_cont(value, 0.95) AS q_0_95
FROM events GROUP BY event_type
""",
    band_rtol=0.05,
)
def agg_quantile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch in the incremental view: quantiles
    aren't distributive, but a FIXED-edge histogram is (per-bin SUM),
    so the store keeps map<bin, count> per group per batch — edges
    recorded in the marker so every batch bins identically — and
    read_quantiles interpolates inside the crossing bin of the merged
    histogram. 2048 bins over [0, 500] bounds the error at ~0.24 per
    estimate; the band oracle pins p50/p95 within ±5% of DuckDB's
    exact quantile_cont over the raw rows."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = AggregateStore(
        spark, _fresh_store_dir("incq"), key_cols=["event_type"],
        aggs={"vhist": ("hist", "value",
                        {"lo": 0.0, "hi": 500.0, "bins": 2048})},
    )
    for cond in (
        F.col("event_id") <= cut1,
        (F.col("event_id") > cut1) & (F.col("event_id") <= cut2),
        F.col("event_id") > cut2,
    ):
        store.process_batch(e.where(cond))
    return store.read_quantiles("vhist", [0.5, 0.95])


@register(
    "agg_window_incremental",
    oracle="""
SELECT hour, event_type, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS cnt, sum(value) AS sum_value
  FROM events GROUP BY 1, 2)
""",
)
def agg_window_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed materialized view: the aggregate store keyed
    by (hour, event_type) — the window is just another group key
    derived before ingest, so late data in any later batch lands as
    one more partial for its hour and the merge heals the window
    without reprocessing (the lakehouse answer to streaming windowed
    state: partials are durable, idempotent, and mergeable). The
    merged view must hash-match DuckDB's one-pass windowed GROUP BY of
    the raw table."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut = lo + (hi - lo) // 2
    store = AggregateStore(
        spark, _fresh_store_dir("incwin"), key_cols=["hour", "event_type"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
    )
    # deliberately NOT time-ordered halves: every hour straddles both
    # batches, proving the merge (late data is just another partial)
    store.process_batch(e.where(F.col("event_id") % 2 == 0))
    store.process_batch(e.where(F.col("event_id") % 2 == 1))
    return store.read().withColumn("sum_value", F.round("sum_value", 2))


@register(
    "agg_var_incremental",
    # restored to the primary tier (r15 optimization round) — see
    # setop_union_all; the declared set matches CORRECTNESS_r14.json
    oracle="""
SELECT event_type, cnt,
       round(avg_value, 6) AS avg_value,
       round(var_value, 4) AS var_value,
       round(std_samp_value, 4) AS std_samp_value
FROM (
  SELECT event_type, count(*) AS cnt,
         avg(value) AS avg_value,
         var_pop(value) AS var_value,
         stddev_samp(value) AS std_samp_value
  FROM events GROUP BY event_type)
""",
)
def agg_var_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev in the incremental materialized view: the
    partial is the exact moment struct(n, sum, sum-of-squares) — an
    element-wise SUM merge, so roll-up-safe and EXACT (vs DuckDB
    var_pop/stddev_samp over the raw rows, hash-matched after
    rounding). The middle batch is deliberately REDELIVERED under its
    committed id inside the gate: the exactly-once log refuses it, so a
    double-count would fail the hash. Non-distributive in value space,
    distributive in moment space — the textbook trick, durable."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = AggregateStore(
        spark, _fresh_store_dir("incvar"), key_cols=["event_type"],
        aggs={"cnt": ("count", None), "avg_value": ("avg", "value"),
              "var_value": ("var", "value"),
              "std_samp_value": ("std", "value", {"ddof": 1})},
    )
    mid = e.where((F.col("event_id") > cut1) & (F.col("event_id") <= cut2))
    store.process_batch(e.where(F.col("event_id") > cut2))
    mid_id = store.process_batch(mid)
    store.process_batch(e.where(F.col("event_id") <= cut1))
    store.process_batch(mid, batch_id=mid_id)  # redelivery: must no-op
    return (
        store.read()
        .withColumn("avg_value", F.round("avg_value", 6))
        .withColumn("var_value", F.round("var_value", 4))
        .withColumn("std_samp_value", F.round("std_samp_value", 4))
    )


@register(
    "agg_topk_incremental",
    extended=True,
    oracle="""
SELECT lang, token AS item, n AS est_n, rk AS rank FROM (
  SELECT lang, token, count(*) AS n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, token) AS rk
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents)
  GROUP BY lang, token)
WHERE rk <= 3
""",
)
def agg_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitter sketch (Misra-Gries) in the incremental
    view: map<token, counter> per group per batch, merged by counter
    SUM + trim — the incremental answer to the exact two-pass
    heavy_hitters (queries/textops.py), which must rescan history on
    every refresh. Gated EXACT: the documents vocabulary is far below
    the 4096-counter capacity, so no trim fires and the top-3 per
    language hash-matches DuckDB's exact recount (rank ties broken by
    token on both engines); the approximation regime — trims firing,
    undercount <= weight/(cap+1), top-k recall under skew — is pinned
    by tests/test_incremental_agg_ext.py on synthetic Zipf data."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.explode(F.split("text", " ")).alias("token"),
    )
    store = AggregateStore(
        spark, _fresh_store_dir("inctopk"), key_cols=["lang"],
        aggs={"tok": ("topk", "token", {"k": 3, "cap": 4096})},
    )
    store.process_batch(toks.where("doc_id % 2 = 0"))
    store.process_batch(toks.where("doc_id % 2 = 1"))
    return store.read_topk("tok").withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@register(
    "agg_join_incremental",
    oracle="""
SELECT source, event_type, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT d.source, e.event_type,
         count(*) AS cnt, sum(e.value) AS sum_value
  FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
  GROUP BY d.source, e.event_type)
""",
)
def agg_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained grouped view over a JOIN (r12 verdict
    ask #1): events ⋈ documents grouped by the document's source — the
    factorized-IVM shape (streaming/incremental_join.py). Fact partials
    at FK grain and the dim's latest-state upsert view each stream in
    as out-of-order micro-batches through their own exactly-once logs;
    the read joins the two GRAINS (broadcast-guarded) and re-groups —
    neither raw history is rescanned — and must hash-match DuckDB's
    one-pass joined GROUP BY of the raw tables. The FK (event_id mod
    700) deliberately misses some documents, proving inner-join drop
    semantics survive the factorization."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoin"),
        fk="doc_fk", fact_keys=["event_type"],
        fact_aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    # out-of-order on BOTH inputs: middle fact batch first, odd dim rows
    # before even ones. The two streams land on INDEPENDENT logs (fact
    # store / dim store), so they ingest from two driver threads —
    # overlapping each micro-batch job's scheduling tail (optimization
    # guide §2.6), exactly as two real CDC feeds would arrive; per-store
    # batch order is unchanged, and the merged read is order-independent.
    # Measured 2.9-3.4 s -> 1.9-2.3 s for the 5-batch ingest at sf0.1.
    from concurrent.futures import ThreadPoolExecutor

    fact_batches = (
        e.where((F.col("event_id") > cut1) & (F.col("event_id") <= cut2)),
        e.where(F.col("event_id") > cut2),
        e.where(F.col("event_id") <= cut1),
    )
    dim_batches = (d.where("doc_id % 2 = 1"), d.where("doc_id % 2 = 0"))
    with ThreadPoolExecutor(2) as pool:
        ft = pool.submit(
            lambda: [view.process_fact_batch(b) for b in fact_batches]
        )
        dt = pool.submit(
            lambda: [view.process_dim_batch(b) for b in dim_batches]
        )
        ft.result()
        dt.result()
    return view.read(["source", "event_type"]).withColumn(
        "sum_value", F.round("sum_value", 2)
    )


@register(
    "agg_join_incremental_left",
    extended=True,
    oracle="""
SELECT source, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT d.source, count(*) AS cnt, sum(e.value) AS sum_value
  FROM events e LEFT JOIN documents d ON (e.event_id % 700) = d.doc_id
  GROUP BY d.source)
""",
)
def agg_join_incremental_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-join variant of the incremental join view: FK groups with
    no dim match survive as the NULL-source group, exactly like SQL
    LEFT JOIN + GROUP BY on the dim attribute."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoinl"),
        fk="doc_fk",
        fact_aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    return view.read(["source"], how="left").withColumn(
        "sum_value", F.round("sum_value", 2)
    )


@register(
    "agg_join_incremental_distinct",
    extended=True,
    band_oracle="""
SELECT source, count(DISTINCT e.user_id) AS approx_users
FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
GROUP BY d.source
""",
    band_rtol=0.05,
)
def agg_join_incremental_distinct(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Mergeable sketches survive the join-view re-group: the fact
    store keeps an HLL register map per FK grain, and the read's
    re-group to the dim attribute merges registers by element-wise MAX
    across the FK subgroups — which IS the HLL of the union, so the
    per-source distinct-user estimate lands in the same ±5% band as a
    single-pass sketch over the joined raw tables would. The thing a
    naive "store the estimate" design cannot do: estimates don't merge,
    register vectors do."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoind"),
        fk="doc_fk",
        fact_aggs={"approx_users": ("hll", "user_id")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    return view.read(["source"])


@register(
    "agg_avg_incremental",
    extended=True,
    band_oracle="""
SELECT event_type, avg(value) AS avg_value FROM events GROUP BY event_type
""",
    band_rtol=1e-9,
)
def agg_avg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fn "avg" standalone (the most-asked-for view column): moment
    partials, element-wise-SUM merge, finalize s/n. Band-gated at
    rtol=1e-9 rather than hash-gated: the source values are exact
    2-decimal doubles, so group averages land on EXACT decimal ties
    where Spark's shortest-decimal HALF_UP and DuckDB's
    nearest-double rounding disagree deterministically (the q8 tie
    class — see the verify notes); the unrounded values agree to the
    summation-order ulp, which the band pins 100× tighter than any
    rounding would."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    store = AggregateStore(
        spark, _fresh_store_dir("incavg"), key_cols=["event_type"],
        aggs={"avg_value": ("avg", "value")},
    )
    store.process_batch(e.where("event_id % 2 = 1"))
    store.process_batch(e.where("event_id % 2 = 0"))
    return store.read()


@register(
    "agg_join_incremental_star",
    extended=True,
    oracle="""
SELECT source, n_name, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT d.source, n.n_name,
         count(*) AS cnt, sum(e.value) AS sum_value
  FROM events e
  JOIN documents d ON (e.event_id % 700) = d.doc_id
  JOIN nation n ON (e.user_id % 25) = n.n_nationkey
  GROUP BY d.source, n.n_name)
""",
)
def agg_join_incremental_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-SCHEMA incremental join view: one fact stream against TWO
    independently-updating dimensions (documents by a deliberately-
    missing FK range, nation by a derived geo key), grouped by one
    attribute of each. The fact store keeps partials at the COMPOSITE
    FK grain; each dim is its own latest-state store; the read joins
    both GRAINS (each broadcast-guarded) and re-groups — hash-exact vs
    DuckDB's one-pass two-join GROUP BY. All three inputs arrive as
    out-of-order micro-batches."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    ).withColumn("nation_fk", F.expr("user_id % 25"))
    d = table(spark, sf_dir, "documents")
    n = table(spark, sf_dir, "nation")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoins"),
        fact_keys=[],
        fact_aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
        dims=[
            {"name": "doc", "fk": "doc_fk", "key": "doc_id",
             "cols": ["source"], "order_by": "doc_id"},
            {"name": "geo", "fk": "nation_fk", "key": "n_nationkey",
             "cols": ["n_name"], "order_by": "n_nationkey"},
        ],
    )
    view.process_dim_batch(n.where("n_nationkey % 2 = 0"), dim="geo")
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"), dim="doc")
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"), dim="doc")
    view.process_dim_batch(n.where("n_nationkey % 2 = 1"), dim="geo")
    return view.read(["source", "n_name"]).withColumn(
        "sum_value", F.round("sum_value", 2)
    )


@register(
    "agg_evolve_incremental",
    extended=True,
    oracle="""
SELECT event_type, cnt, round(sum_value_late, 2) AS sum_value_late
FROM (
  SELECT event_type, count(*) AS cnt,
         sum(CASE WHEN event_id > (SELECT min(event_id)
                                   + (max(event_id) - min(event_id)) // 3
                                   FROM events)
                  THEN value END) AS sum_value_late
  FROM events GROUP BY event_type)
""",
)
def agg_evolve_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on a live view (add_agg): the store starts as a
    per-type count, ingests a third of the stream, then gains a sum
    column mid-stream — which accumulates FROM THE EVOLUTION POINT
    (old partials read NULL for it; nothing is rewritten). The view
    must hash-match DuckDB computing the count over ALL rows and the
    sum over only the post-evolution rows — the CASE-gated oracle IS
    the evolution semantics expressed in one pass."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut = lo + (hi - lo) // 3
    store = AggregateStore(
        spark, _fresh_store_dir("incevo"), key_cols=["event_type"],
        aggs={"cnt": ("count", None)},
    )
    store.process_batch(e.where(F.col("event_id") <= cut))
    store.add_agg("sum_value_late", "sum", "value")
    # post-evolution batches arrive out of order; the new column sums
    # exactly the rows ingested after the evolution point
    mid = lo + 2 * (hi - lo) // 3
    store.process_batch(e.where(F.col("event_id") > mid))
    store.process_batch(
        e.where((F.col("event_id") > cut) & (F.col("event_id") <= mid)))
    return store.read().withColumn(
        "sum_value_late", F.round("sum_value_late", 2))


@register(
    "agg_expire_windows",
    extended=True,
    oracle="""
SELECT hour, event_type, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS cnt, sum(value) AS sum_value
  FROM events GROUP BY 1, 2)
WHERE hour >= TIMESTAMP '2024-01-02 00:00:00'
""",
)
def agg_expire_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based retention on the windowed view (r12 verdict ask #2):
    after out-of-order ingest, ``expire_windows`` tombstones every
    window group older than the retention horizon — metadata-cheap
    (the expired values are enumerated from a sidecar-pruned range
    read, O(expired groups)) — and the surviving view must hash-match
    DuckDB's windowed GROUP BY restricted to the horizon. Physical
    reclaim and groups-boundedness over a year-shaped stream are pinned
    by tests/test_incremental_agg_ext.py."""
    import datetime as _dt

    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    store = AggregateStore(
        spark, _fresh_store_dir("incexp"), key_cols=["hour", "event_type"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
    )
    store.process_batch(e.where("event_id % 2 = 0"))
    store.process_batch(e.where("event_id % 2 = 1"))
    store.expire_windows(_dt.datetime(2024, 1, 2))
    return store.read().withColumn("sum_value", F.round("sum_value", 2))


@register(
    "agg_rollup_incremental_lookup2",
    extended=True,
    oracle="""
SELECT event_type, user_id, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT event_type, user_id, count(*) AS cnt, sum(value) AS sum_value
  FROM events GROUP BY event_type, user_id)
WHERE event_type = 'click' AND user_id IN (3, 4, 5)
""",
)
def agg_rollup_incremental_lookup2(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """COMPOSITE keyed lookup into the materialized view (r12 verdict
    ask #6): the sidecars record min/max for BOTH key columns, so a
    two-predicate probe (point-IN on event_type AND on user_id) prunes
    partial dirs/files on whichever column disqualifies them — then the
    row predicate makes it exact, hash-matched against DuckDB over the
    raw table."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut = lo + (hi - lo) // 2
    store = AggregateStore(
        spark, _fresh_store_dir("incagglk2"),
        key_cols=["event_type", "user_id"],
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
    )
    store.process_batch(e.where(F.col("event_id") <= cut))
    store.process_batch(e.where(F.col("event_id") > cut))
    probe = {"event_type": ["click"], "user_id": [3, 4, 5]}
    return (
        store.read(prune_in=probe)
        .where(F.col("event_type").isin(probe["event_type"])
               & F.col("user_id").isin(probe["user_id"]))
        .withColumn("sum_value", F.round("sum_value", 2))
    )


@register(
    "agg_upsert_incremental",
    extended=True,
    oracle="""
SELECT user_id, latest_v, n_events FROM (
  SELECT user_id, value AS latest_v,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events) WHERE rk = 1
""",
)
def agg_upsert_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state (upsert / CDC-mirror) view from an append-only
    log: fn "last" carries struct(order, value) partials whose
    lexicographic MAX is argmax-by-order — distributive, so the view
    maintains 'the newest value per key' incrementally, roll-up folds
    keep one struct per key on disk, and the merged answer must
    hash-match DuckDB's row_number()-over-raw-history pick. The order
    key struct(ts, event_id) is unique per row, making the pick
    deterministic on both engines. Batches arrive NON-chronologically
    (even/odd event_id split): late data cannot displace a newer
    value, exactly like a keyed upsert."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    store = AggregateStore(
        spark, _fresh_store_dir("incup"), key_cols=["user_id"],
        aggs={"latest_v": ("last", "value",
                           {"by": "struct(ts, event_id)"}),
              "n_events": ("count", None)},
    )
    store.process_batch(e.where("event_id % 2 = 0"))
    store.process_batch(e.where("event_id % 2 = 1"))
    return store.read()


@register(
    "agg_retract_incremental",
    oracle="""
SELECT event_type, cnt, round(sum_value, 2) AS sum_value,
       round(avg_value, 6) AS avg_value,
       round(var_value, 4) AS var_value
FROM (
  SELECT event_type, count(*) AS cnt, sum(value) AS sum_value,
         avg(value) AS avg_value, var_pop(value) AS var_value
  FROM events
  WHERE NOT (event_id % 7 = 3
             OR event_type = (SELECT min(event_type) FROM events))
  GROUP BY event_type)
""",
)
def agg_retract_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level retraction in the incremental materialized view (r13
    verdict ask #1): a ``retractable=True`` store ingests the events
    stream as out-of-order micro-batches INTERLEAVED with CDC delete
    batches — every ``event_id % 7 = 3`` row, plus every row of one
    whole event_type (which must DROP from the view, not linger as a
    zero row: the signed __support multiplicity). One delete batch is
    REDELIVERED under its committed id and must no-op (double-deletion
    is the retraction twin of double-counting), and one delete arrives
    BEFORE the batch that inserts its rows (the merge is commutative —
    Z-set semantics, DBSP/Materialize). The merged view must hash-match
    DuckDB's one-pass aggregate over the POST-DELETE table — count,
    sum, and the raw-moment avg/var_pop partials all decremented
    exactly."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    gone_type = e.agg(F.min("event_type")).first()[0]
    store = AggregateStore(
        spark, _fresh_store_dir("incret"), key_cols=["event_type"],
        retractable=True,
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value"),
              "avg_value": ("avg", "value"),
              "var_value": ("var", "value")},
    )
    dels = e.where("event_id % 7 = 3")
    store.process_batch(e.where(F.col("event_id") > cut2))
    # this delete covers rows of ALL THREE insert batches — including
    # two not yet ingested: retraction order must not matter
    rid = store.process_retract_batch(dels)
    store.process_batch(e.where(F.col("event_id") <= cut1))
    store.process_retract_batch(dels, batch_id=rid)  # redelivery: no-op
    store.process_batch(
        e.where((F.col("event_id") > cut1) & (F.col("event_id") <= cut2)))
    # full-group CDC delete: every remaining row of the first type
    store.process_retract_batch(
        e.where((F.col("event_type") == gone_type)
                & (F.col("event_id") % 7 != 3)))
    return (
        store.read()
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn("avg_value", F.round("avg_value", 6))
        .withColumn("var_value", F.round("var_value", 4))
    )


@register(
    "agg_retract_minmax",
    extended=True,  # r15 interrupted-build rotation undone in the
    # optimization round: the driver-declared set stays the r14-verified
    # one; this surface is oracle-gated by our own two-tier gate
    oracle="""
WITH b AS (
  SELECT (SELECT min(event_type) FROM events) AS t_lo,
         (SELECT max(event_type) FROM events) AS t_hi
), thr AS (
  SELECT
    (SELECT (min(value) + max(value)) / 2 FROM events, b
     WHERE event_type = b.t_lo) AS c_lo,
    (SELECT (min(value) + max(value)) / 2 FROM events, b
     WHERE event_type = b.t_hi) AS c_hi
), kept AS (
  SELECT e.* FROM events e, b, thr
  WHERE NOT (e.event_id % 7 = 3
             OR (e.event_type = b.t_lo AND e.value < thr.c_lo)
             OR (e.event_type = b.t_hi AND e.value > thr.c_hi))
)
SELECT event_type, cnt, min_value, max_value, latest_v FROM (
  SELECT event_type, value AS latest_v,
         count(*) OVER (PARTITION BY event_type) AS cnt,
         min(value) OVER (PARTITION BY event_type) AS min_value,
         max(value) OVER (PARTITION BY event_type) AS max_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM kept) WHERE rk = 1
""",
)
def agg_retract_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC deletes against min/max/last columns in the retractable
    view (r14 verdict ask #1 — the one CDC event class that previously
    forced a view rebuild): bounded k-extrema candidate partials track
    the k extreme distinct values per group as a signed multiset with
    a completeness frontier, so deletes inside the frontier absorb in
    O(touched groups) with the IDENTICAL one-merge read plan, and a
    DRAINED frontier (this query deletes EVERY value below the lowest
    type's midpoint — far more than k=8 candidates, by construction)
    marks the group dirty for ``re_derive``, which tombstones and
    re-ingests ONLY those groups' post-delete rows — never a history
    rescan. The gate exercises the full contract: out-of-order insert
    and delete batches, a redelivered delete (must no-op), a drained
    min frontier on one type AND a drained max frontier on another,
    the targeted re-derive, then a hash-exact match vs DuckDB's
    one-pass min/max/argmax over the POST-DELETE table. Thresholds are
    (min+max)/2 — bitwise identical in both engines, unlike an
    accumulated avg. Raw values serve unrounded (no arithmetic)."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    lo, hi = column_minmax(spark, sf_dir, "events", "event_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    t_lo, t_hi = e.agg(F.min("event_type"), F.max("event_type")).first()
    c_lo = e.where(F.col("event_type") == t_lo).agg(
        (F.min("value") + F.max("value")) / 2).first()[0]
    c_hi = e.where(F.col("event_type") == t_hi).agg(
        (F.min("value") + F.max("value")) / 2).first()[0]
    store = AggregateStore(
        spark, _fresh_store_dir("incmm"), key_cols=["event_type"],
        retractable=True,
        aggs={"cnt": ("count", None),
              "min_value": ("min", "value", {"k": 8}),
              "max_value": ("max", "value", {"k": 8}),
              "latest_v": ("last", "value",
                           {"by": "struct(ts, event_id)", "k": 8})},
    )
    # three DISJOINT delete sets (a row must be retracted exactly once)
    d1 = e.where("event_id % 7 = 3")
    d2 = e.where((F.col("event_type") == t_lo) & (F.col("value") < c_lo)
                 & (F.col("event_id") % 7 != 3))  # drains t_lo's min
    d3 = e.where((F.col("event_type") == t_hi) & (F.col("value") > c_hi)
                 & (F.col("event_id") % 7 != 3))  # drains t_hi's max
    store.process_batch(e.where(F.col("event_id") > cut2))
    rid = store.process_retract_batch(d1)  # covers not-yet-inserted rows
    store.process_batch(e.where(F.col("event_id") <= cut1))
    store.process_retract_batch(d1, batch_id=rid)  # redelivery: no-op
    store.process_retract_batch(d2)
    store.process_batch(
        e.where((F.col("event_id") > cut1) & (F.col("event_id") <= cut2)))
    store.process_retract_batch(d3)
    kept = e.where(~((F.col("event_id") % 7 == 3)
                     | ((F.col("event_type") == t_lo)
                        & (F.col("value") < c_lo))
                     | ((F.col("event_type") == t_hi)
                        & (F.col("value") > c_hi))))
    # the drained frontiers are dirty by construction; heal exactly
    # those groups from the post-delete source (any other group that
    # happened to drain heals in the same targeted pass)
    store.re_derive(kept)
    return store.read()


@register(
    "agg_join_retract_incremental",
    extended=True,
    oracle="""
SELECT source, event_type, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT d.source, e.event_type,
         count(*) AS cnt, sum(e.value) AS sum_value
  FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
  WHERE NOT (e.event_id % 5 = 2 OR e.event_id % 700 = 0)
  GROUP BY d.source, e.event_type)
""",
)
def agg_join_retract_incremental(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """CDC deletes through the JOIN view's fact side: the retractable
    fact store absorbs out-of-order insert AND delete batches —
    including one that empties an entire FK group (doc_fk 0), which
    must vanish from every read grain — while the dim upserts stream
    independently. Hash-exact vs DuckDB's one-pass joined GROUP BY
    over the post-delete fact table: the negative partials ride the
    same FK-grain log, so a retraction costs O(touched FK groups),
    never a history rescan."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoinr"),
        fk="doc_fk", fact_keys=["event_type"],
        fact_aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
        retractable=True,
    )
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_retract_batch(e.where("event_id % 5 = 2"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    # empty a whole FK group: its row must DROP at every grain
    view.process_fact_retract_batch(
        e.where("event_id % 700 = 0 and event_id % 5 != 2"))
    return view.read(["source", "event_type"]).withColumn(
        "sum_value", F.round("sum_value", 2)
    )


@register(
    "agg_retract_quantile_exact",
    extended=True,
    oracle="""
SELECT event_type,
       quantile_disc(value, 0.5) AS q_0_5,
       quantile_disc(value, 0.9) AS q_0_9
FROM events
WHERE event_id % 3 != 1
GROUP BY event_type
""",
)
def agg_retract_quantile_exact(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """EXACT medians/quantiles under row-level CDC — the arrangement's
    third exact answer: quantile_disc's crossing order statistic falls
    out of the same per-(group, value) signed counts as distinct and
    top-k (smallest value with cumulative count >= ceil(q·total)), so
    the gate is HASH-exact vs DuckDB over the post-delete table —
    where the retractable hist-sketch twin (agg_retract_quantile) can
    only band-match within its bin width. Raw values serve unrounded
    (the quantile IS a source value, no arithmetic). Same honest price
    as the rest of the arrangement: O(distinct pairs) state, per-group
    sort on read."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_distinct import DistinctView

    e = table(spark, sf_dir, "events")
    v = DistinctView(spark, _fresh_store_dir("incrqx"),
                     key_cols=["event_type"], value_col="value")
    v.process_batch(e.where("event_id % 2 = 0"))
    v.process_retract_batch(e.where("event_id % 3 = 1"))
    v.process_batch(e.where("event_id % 2 = 1"))
    return v.read_quantiles([0.5, 0.9])


@register(
    "agg_join_retract_distinct",
    extended=True,
    oracle="""
SELECT d.source,
       count(DISTINCT e.user_id) AS distinct_user_id,
       count(*) AS cnt
FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
WHERE e.event_id % 3 != 1
GROUP BY d.source
""",
)
def agg_join_retract_distinct(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """EXACT count(DISTINCT) ACROSS the join re-group under fact-side
    CDC — the retractable, lossless counterpart of the HLL twin
    (agg_join_incremental_distinct, which can only band-match ±5% and
    cannot retract at all): the fact store keeps the support-count
    arrangement at (doc_fk, user_id) grain, per-pair signed counts SUM
    through the FK → source re-group into per-(source, user_id)
    counts, and distinct = surviving pairs — hash-exact vs DuckDB's
    count(DISTINCT) over the post-delete join. One exchange beyond
    the join-view family's base shape (the final distinct re-group);
    deletes cost O(touched pairs), never a history rescan. The delete
    batch lands BETWEEN the two insert halves and before half the dim
    rows (out-of-order Z-set merge + independent dim upserts)."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_distinct import (
        read_joined_distinct,
    )
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoind"),
        fk="doc_fk", fact_keys=["user_id"],
        fact_aggs={"n": ("count", None)},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
        retractable=True,
    )
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_retract_batch(e.where("event_id % 3 = 1"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    return read_joined_distinct(view, "user_id", ["source"],
                                include_total=True)


@register(
    "agg_join_retract_quantile_exact",
    extended=True,
    oracle="""
SELECT source,
       quantile_disc(value, 0.5) AS q_0_5,
       quantile_disc(value, 0.9) AS q_0_9
FROM (SELECT d.source, e.value
      FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
      WHERE e.event_id % 3 != 1)
GROUP BY source
""",
)
def agg_join_retract_quantile_exact(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """EXACT quantile_disc ACROSS the join re-group under fact-side
    CDC — completing the exact across-join family (distinct, top-k,
    quantiles) from one pair-grain arrangement: per-(doc_fk, value)
    signed counts SUM through the FK → source re-group and the
    crossing order statistic is read off the re-grouped cumulative
    counts — hash-exact vs DuckDB over the post-delete join, where
    the hist-sketch ride (agg_join_incremental_quantile) can only
    band-match within its bin width."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_distinct import (
        read_joined_quantiles,
    )
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoinq"),
        fk="doc_fk", fact_keys=["value"],
        fact_aggs={"n": ("count", None)},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
        retractable=True,
    )
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_retract_batch(e.where("event_id % 3 = 1"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    return read_joined_quantiles(view, "value", ["source"], [0.5, 0.9])


@register(
    "agg_join_incremental_topk",
    extended=True,
    oracle="""
SELECT source, item, est_n, rank FROM (
  SELECT d.source, e.user_id AS item, count(*) AS est_n,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY count(*) DESC, e.user_id) AS rank
  FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
  GROUP BY d.source, e.user_id)
WHERE rank <= 3
""",
)
def agg_join_incremental_topk(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Heavy hitters ACROSS the join re-group (r13 verdict ask #2's
    opt-in path): per-source top user_ids from the fact store's
    Misra-Gries maps, merged counter-SUM through the FK→source
    re-group. ``cap`` is sized above the distinct-user count, so no
    merge ever trims and the sketch is EXACT — hash-matched against
    DuckDB's full recount + rank. The default ``view.read()`` REFUSES
    topk columns (the single-store undercount bound does not carry
    across the re-group); ``read_topk`` is the documented surface."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoink"),
        fk="doc_fk", fact_keys=[],
        fact_aggs={"top_users": ("topk", "user_id",
                                 {"k": 3, "cap": 65536})},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    return view.read_topk("top_users", ["source"]).withColumn(
        "rank", F.col("rank").cast("bigint")
    )


@register(
    "agg_retract_quantile",
    extended=True,
    band_oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS q_0_5,
       quantile_cont(value, 0.9) AS q_0_9
FROM events
WHERE event_id % 3 != 1
GROUP BY event_type
""",
    band_rtol=0.05,
)
def agg_retract_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketches under retraction: the fixed-edge histogram's
    per-bin SUM merge subtracts a delete batch's negated bin counts
    exactly, so read_quantiles over the post-delete sketch lands
    within the same ±5% band as the insert-only twin
    (agg_quantile_incremental) — vs DuckDB's exact quantile_cont over
    the remaining rows."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    store = AggregateStore(
        spark, _fresh_store_dir("incretq"), key_cols=["event_type"],
        retractable=True,
        aggs={"vhist": ("hist", "value",
                        {"lo": 0.0, "hi": 500.0, "bins": 2048})},
    )
    store.process_batch(e.where("event_id % 2 = 0"))
    store.process_retract_batch(e.where("event_id % 3 = 1"))
    store.process_batch(e.where("event_id % 2 = 1"))
    # p50/p90, not p95: the post-delete groups are small (~130 rows at
    # sf0.001) and the value tail is sparse — at p95 the gap between
    # adjacent order statistics exceeds the band, which measures
    # order-statistic interpolation, not the sketch (the folded bins
    # are recount-exact under retraction; see test_incremental_agg)
    return store.read_quantiles("vhist", [0.5, 0.9])


@register(
    "agg_retract_distinct",
    extended=True,  # r15 interrupted-build rotation undone in the
    # optimization round — see agg_retract_minmax; stays in the bench
    # extras and our own oracle gate
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS distinct_user_id,
       count(*) AS cnt
FROM events
WHERE event_id % 3 != 1
GROUP BY event_type
""",
)
def agg_retract_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT count(DISTINCT) under row-level CDC — the support-count
    arrangement (streaming/incremental_distinct.py): hll is refused on
    retractable stores (registers only grow), so the view keeps the
    exact signed count of every (group, value) pair instead — the
    DBSP/Materialize arrangement of the distinct operator — and a
    delete is one −1 on one pair. Distinct = values with support > 0:
    deletes are EXACT (hash gate, not a band — note the insert-only
    sketch twin agg_distinct_incremental can only band-match ±5%),
    state is O(distinct pairs), reads are 2 exchanges (pair-grain
    fold + re-group) and never touch raw history. The delete arrives
    BEFORE half its inserts (commutative Z-set merge)."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_distinct import DistinctView

    e = table(spark, sf_dir, "events")
    v = DistinctView(spark, _fresh_store_dir("incrdist"),
                     key_cols=["event_type"], value_col="user_id")
    v.process_batch(e.where("event_id % 2 = 0"))
    v.process_retract_batch(e.where("event_id % 3 = 1"))
    v.process_batch(e.where("event_id % 2 = 1"))
    return v.read_distinct(include_total=True)


@register(
    "agg_retract_topk",
    extended=True,
    oracle="""
SELECT event_type, user_id, n FROM (
  SELECT event_type, user_id, count(*) AS n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY count(*) DESC, user_id) AS rk
  FROM events
  WHERE event_id % 3 != 1
  GROUP BY event_type, user_id
) WHERE rk <= 3
""",
)
def agg_retract_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group heavy hitters under row-level CDC, from the
    same support-count arrangement as agg_retract_distinct: the
    Misra-Gries ``topk`` sketch cannot give deleted mass back (its
    compression is lossy by design), but the exact pair-grain counts
    can — top-k is then just the k largest surviving counts per group,
    ties broken deterministically by ascending value (the identical
    (n DESC, value ASC) order the DuckDB oracle states), so the gate
    is hash-exact over the POST-DELETE table. The window sorts pairs
    within each group — O(V log V) per group, the standard exact
    top-k cost; insert-only pipelines keep the O(groups)-state sketch
    (agg_topk_incremental) when approximation is acceptable."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_distinct import DistinctView

    e = table(spark, sf_dir, "events")
    v = DistinctView(spark, _fresh_store_dir("incrtopk"),
                     key_cols=["event_type"], value_col="user_id")
    v.process_batch(e.where("event_id % 2 = 0"))
    v.process_retract_batch(e.where("event_id % 3 = 1"))
    v.process_batch(e.where("event_id % 2 = 1"))
    return v.read_topk(3)


@register(
    "agg_join_incremental_quantile",
    extended=True,
    band_oracle="""
SELECT source,
       quantile_disc(value, 0.5) AS q_0_5,
       quantile_disc(value, 0.9) AS q_0_9
FROM (SELECT d.source, e.value
      FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id)
GROUP BY source
""",
    band_rtol=0.05,
)
def agg_join_incremental_quantile(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Quantile sketches ACROSS the join re-group — the third member of
    the sketch-across-join family (HLL: agg_join_incremental_distinct;
    topk: agg_join_incremental_topk): fixed-edge histogram bins merge
    by per-bin SUM through the FK → source re-group, so unlike topk no
    error bound is lost — the merged sketch IS the sketch of the
    joined rows, and the joined-grain p50/p90 land within ±5% of
    DuckDB's exact quantile_disc over the raw join — the DISC quantile
    (crossing order statistic) is the estimator's own definition, so
    the bound is the bin width even for the small sparse joined groups
    at sf0.001 where quantile_cont's interpolation across value gaps
    diverges from any histogram."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoinq"),
        fk="doc_fk", fact_keys=[],
        fact_aggs={"vhist": ("hist", "value",
                             {"lo": 0.0, "hi": 500.0, "bins": 2048})},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    return view.read_quantiles("vhist", [0.5, 0.9], ["source"])


@register(
    "agg_update_incremental",
    extended=True,
    oracle="""
SELECT event_type, cnt, round(sum_value, 2) AS sum_value,
       round(avg_value, 6) AS avg_value
FROM (
  SELECT event_type, count(*) AS cnt,
         sum(CASE WHEN event_id % 11 = 5 THEN value + 1000.0
                  ELSE value END) AS sum_value,
         avg(CASE WHEN event_id % 11 = 5 THEN value + 1000.0
                  ELSE value END) AS avg_value
  FROM events GROUP BY event_type)
""",
)
def agg_update_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC UPDATE = retract(old row) + insert(new row) — the standard
    Z-set decomposition: every ``event_id % 11 = 5`` row's value is
    bumped by 1000 AFTER initial ingest by retracting the original rows
    and inserting the modified ones (out of order relative to each
    other — the merge commutes). The view must hash-match DuckDB's
    one-pass aggregate over the post-update table; counts are unchanged
    (an update is not a delete), sums and the raw-moment averages move
    exactly."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    store = AggregateStore(
        spark, _fresh_store_dir("incupd"), key_cols=["event_type"],
        retractable=True,
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value"),
              "avg_value": ("avg", "value")},
    )
    store.process_batch(e.where("event_id % 2 = 0"))
    store.process_batch(e.where("event_id % 2 = 1"))
    upd = e.where("event_id % 11 = 5")
    # the INSERT half of the update lands before the RETRACT half
    store.process_batch(upd.withColumn("value", F.col("value") + 1000.0))
    store.process_retract_batch(upd)
    return (
        store.read()
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn("avg_value", F.round("avg_value", 6))
    )


@register(
    "agg_cdc_incremental",
    extended=True,
    oracle="""
SELECT event_type, cnt, round(sum_value, 2) AS sum_value
FROM (
  SELECT event_type, count(*) AS cnt,
         sum(CASE WHEN event_id % 13 = 4 THEN value * 2.0
                  ELSE value END) AS sum_value
  FROM events
  WHERE event_id % 13 != 9
  GROUP BY event_type)
""",
)
def agg_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED CDC micro-batches (process_cdc_batch): each batch carries
    op-tagged inserts AND deletes committed as ONE atomic signed
    partial — the half-application window of paired insert/retract
    commits cannot exist. The feed: initial inserts, then one mixed
    batch UPDATING every ``event_id % 13 = 4`` row (delete old value +
    insert doubled value) while DELETING every ``% 13 = 9`` row, with
    one mixed batch REDELIVERED under its committed id (refused whole).
    Hash-exact vs DuckDB's one-pass over the post-CDC table."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    e = table(spark, sf_dir, "events")
    store = AggregateStore(
        spark, _fresh_store_dir("inccdc"), key_cols=["event_type"],
        retractable=True,
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
    )
    ins = e.select("event_type", "value", F.lit("I").alias("op"),
                   "event_id")
    store.process_cdc_batch(ins.where("event_id % 2 = 0").drop("event_id"))
    store.process_cdc_batch(ins.where("event_id % 2 = 1").drop("event_id"))
    upd = e.where("event_id % 13 = 4")
    dels = e.where("event_id % 13 = 9")
    mixed = (
        upd.select("event_type", "value", F.lit("D").alias("op"))
        .unionByName(upd.select(
            "event_type", (F.col("value") * 2.0).alias("value"),
            F.lit("I").alias("op")))
        .unionByName(dels.select("event_type", "value",
                                 F.lit("D").alias("op")))
    )
    bid = store.process_cdc_batch(mixed)
    store.process_cdc_batch(mixed, batch_id=bid)  # redelivery: whole no-op
    return store.read().withColumn("sum_value", F.round("sum_value", 2))


@register(
    "agg_join_incremental_var",
    extended=True,
    oracle="""
SELECT source, cnt,
       round(avg_value, 6) AS avg_value,
       round(var_value, 4) AS var_value
FROM (
  SELECT d.source, count(*) AS cnt,
         avg(e.value) AS avg_value,
         var_pop(e.value) AS var_value
  FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
  GROUP BY d.source)
""",
)
def agg_join_incremental_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welford/Chan moments ACROSS the join re-group: the fact store's
    struct(n, mean, M2) partials merge by the Chan pairwise combine
    TWICE — once at FK grain, once through the FK → source re-group —
    and associativity makes the double merge exact (hash-matched after
    rounding vs DuckDB's one-pass joined avg/var_pop). Completes the
    across-join algebra table: sum/count (agg_join_incremental), HLL
    (_distinct), Misra-Gries (_topk), histogram (_quantile), and now
    the stable moment structs."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    e = table(spark, sf_dir, "events").withColumn(
        "doc_fk", F.expr("event_id % 700")
    )
    d = table(spark, sf_dir, "documents")
    view = JoinedAggregateView(
        spark, _fresh_store_dir("incjoinv"),
        fk="doc_fk", fact_keys=[],
        fact_aggs={"cnt": ("count", None),
                   "avg_value": ("avg", "value"),
                   "var_value": ("var", "value")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
    )
    view.process_fact_batch(e.where("event_id % 2 = 1"))
    view.process_dim_batch(d.where("doc_id % 2 = 0"))
    view.process_fact_batch(e.where("event_id % 2 = 0"))
    view.process_dim_batch(d.where("doc_id % 2 = 1"))
    return (
        view.read(["source"])
        .withColumn("avg_value", F.round("avg_value", 6))
        .withColumn("var_value", F.round("var_value", 4))
    )

"""Join operator coverage: inner/left/right/full/semi/anti, broadcast,
cross, theta (inequality), non-equi range banding, and as-of.

Scale posture: dims are broadcast; fact-fact joins shuffle on their keys
with AQE skew handling; the range join is broadcast-nested-loop against a
tiny in-memory band dim; the as-of join is the single-shuffle union+window
formulation from ``doreisa_spark.operators.asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.operators.literal import literal_frame
from doreisa_spark.operators.asof import asof_join
from doreisa_spark.registry import register


@register(
    "join_inner_broadcast",
    oracle="""
SELECT s_suppkey, s_name, n_name, r_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain through two broadcast dims."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        s.join(bcast(n), s.s_nationkey == n.n_nationkey)
        .join(bcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@register(
    "join_left_outer", extended=True,
    oracle="""
SELECT o_orderkey, o_orderstatus, count(l_orderkey) AS n_items,
       round(coalesce(sum(l_quantity), 0.0), 2) AS total_qty
FROM orders
LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity > 45
GROUP BY o_orderkey, o_orderstatus
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra join-side predicate (kept in the ON
    clause, not WHERE — semantics differ and we preserve them)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_quantity > 45), "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias("total_qty"),
        )
    )


@register(
    "join_right_outer", extended=True,
    oracle="""
SELECT p_partkey, p_brand, count(l_orderkey) AS n_lineitems
FROM lineitem
RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_brand
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — parts with no lineitems survive with count 0."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        l.join(p, l.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_brand")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@register(
    "join_full_outer",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (nations with only
    customers or only suppliers survive on the respective side)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@register(
    "join_left_semi", extended=True,
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having a >300k order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_cross", extended=True,
    oracle="""
SELECT r_name, x.o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) x
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (5 × 3 rows)."""
    r = table(spark, sf_dir, "region").select("r_name")
    st = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


@register(
    "join_theta_inequality", extended=True,
    oracle="""
SELECT n1.n_regionkey AS regionkey, count(*) AS n_pairs
FROM nation n1
JOIN nation n2
  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
GROUP BY n1.n_regionkey
""",
)
def join_theta_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi on region + strict inequality on the key (pair
    enumeration without self-pairs/duplicates)."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .groupBy(F.col("n1.n_regionkey").alias("regionkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_range_bands",
    oracle="""
WITH bands(band_id, lo, hi) AS (
  VALUES (1, 0.0, 50000.0), (2, 50000.0, 150000.0),
         (3, 150000.0, 300000.0), (4, 300000.0, 1000000000.0)
)
SELECT band_id, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id
""",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join against a tiny band dim (broadcast nested loop).

    At 100 TB the fact side streams through; the band dim is broadcast so
    there is no shuffle at all before the final 4-group aggregate.
    """
    o = table(spark, sf_dir, "orders")
    # literal_frame: a LocalRelation, not a 32-slice pickled Python RDD —
    # the old createDataFrame scanned 32 Python-worker tasks to produce 4
    # rows, ~0.4 s of overhead per run (OPTIMIZATION_r15.md)
    bands = literal_frame(
        spark,
        [(1, 0.0, 50000.0), (2, 50000.0, 150000.0), (3, 150000.0, 300000.0), (4, 300000.0, 1e9)],
        "band_id int, lo double, hi double",
    )
    return (
        o.join(
            bcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "join_asof_purchase_click",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
       ) AS ts_asof
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before the purchase time (null when none). Single-shuffle union+window
    formulation — see operators/asof.py; mirrors the reference's
    time-ordered semantics (doreisa windows over timesteps,
    window_api.py:91-97) applied to event time."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["ts"]
    )


@register(
    "join_salted_skew",
    extended=True,
    oracle="""
WITH dim AS (
  SELECT event_type, count(*) AS type_total FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, d.type_total
FROM events e JOIN dim d USING (event_type)
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a pathologically hot key: event_type has a handful of
    distinct values, so EVERY row of the big side competes for ~5 hash
    partitions — the worst case AQE's skew splitting can't always save
    (one key, one partition, one task). ``salted_join`` spreads each hot
    key across 8 content-derived salts and replicates the (tiny) dim side
    8×, so the join parallelism is keys×salts while the result multiset is
    IDENTICAL to the plain join — which is exactly what the oracle runs."""
    from doreisa_spark.operators.salted import salted_join

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
    big = e.select("event_id", "event_type")
    return salted_join(big, dim, "event_type", n_salts=8).select(
        "event_id", "event_type", "type_total"
    )


@register(
    "join_interval_overlap",
    extended=True,
    oracle="""
WITH iv AS (
  SELECT o_orderkey AS k, o_custkey AS ck, o_orderdate AS lo,
         o_orderdate + to_days(CAST(o_orderkey % 7 + 1 AS INTEGER)) AS hi
  FROM orders
)
SELECT a.ck AS custkey, a.k AS key_a, b.k AS key_b,
       CAST(date_diff('day', greatest(a.lo, b.lo), least(a.hi, b.hi)) AS INTEGER)
         AS overlap_days
FROM iv a JOIN iv b
  ON a.ck = b.ck AND a.k < b.k
 AND a.lo <= b.hi AND b.lo <= a.hi
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join — the temporal-join shape range/as-of
    joins don't cover (genomics region joins, concurrent-session
    detection): each order carries an active interval
    [orderdate, orderdate + 1..7 days]; find same-customer order pairs
    whose intervals intersect, with the overlap length.

    Plan: ONE equi-shuffle on the customer key; the interval predicate is
    a residual filter inside the join (never a cartesian) — per-customer
    group sizes bound the pair fan-out, the standard partition-then-
    overlap strategy. Date arithmetic is integer-exact."""
    o = table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("lo"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 7 + 1).cast("int"),
        ).cast("timestamp").alias("hi"),
    )
    a = iv.alias("a")
    b = iv.alias("b")
    cond = (
        (F.col("a.ck") == F.col("b.ck"))
        & (F.col("a.k") < F.col("b.k"))
        & (F.col("a.lo") <= F.col("b.hi"))
        & (F.col("b.lo") <= F.col("a.hi"))
    )
    return a.join(b, cond).select(
        F.col("a.ck").alias("custkey"),
        F.col("a.k").alias("key_a"),
        F.col("b.k").alias("key_b"),
        F.datediff(
            F.least(F.col("a.hi"), F.col("b.hi")),
            F.greatest(F.col("a.lo"), F.col("b.lo")),
        ).cast("int").alias("overlap_days"),
    )

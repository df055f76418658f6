"""sf1 receipts for the view layer (r14 verdict ask #7).

The sf1 head-to-head (tools/baseline_run.py) covers the 13 headline
queries; this tool measures the DEPLOYMENT tier at the same largest
local scale: the incremental materialized views' READ paths vs the
one-pass rescan of the raw sf1 tables a non-incremental system pays on
every refresh (DuckDB runs the registry oracle SQL — the strongest
local rescan engine we have — and Spark runs the same rescan for
engine-overhead context).

Three read shapes, each after a realistic multi-micro-batch ingest:

- rollup_full      — AggregateStore.read() full merge (grain: event_type)
                     vs GROUP BY rescan of raw events;
- rollup_lookup    — keyed pruned read (user_id BETWEEN 3 AND 7 with
                     prune_between sidecar skipping; grain: user_id)
                     vs the filtered aggregate rescan;
- join_read        — JoinedAggregateView.read() (events ⋈ documents,
                     re-grouped by source × event_type) vs the joined
                     GROUP BY rescan.

The honest framing: at a FIXED history size the rescan engine can win
on a trivial grain (DuckDB scans sf1 events in tens of ms; a Spark
read pays fixed job-launch cost) — the view's claim is that its read
is FLAT in history length while every rescan grows without bound
(BENCH_incremental_join_r14.json carries that curve to 100M fact
rows). This receipt pins where sf1 sits on that curve.

Usage: python tools/bench_view_read_sf1.py [out.json] [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from doreisa_spark.catalog import table  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_agg import AggregateStore  # noqa: E402
from doreisa_spark.streaming.incremental_join import JoinedAggregateView  # noqa: E402

N_BATCHES = 8

DUCK_SQL = {
    "rollup_full": """
SELECT event_type, count(*) AS cnt, sum(value) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type""",
    "rollup_lookup": """
SELECT user_id, count(*) AS cnt, sum(value) AS sum_value
FROM events WHERE user_id BETWEEN 3 AND 7 GROUP BY user_id""",
    "join_read": """
SELECT d.source, e.event_type, count(*) AS cnt, sum(e.value) AS sum_value
FROM events e JOIN documents d ON (e.event_id % 700) = d.doc_id
GROUP BY d.source, e.event_type""",
    "join_lineitem_supplier": """
SELECT s.s_nationkey, count(*) AS cnt,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey""",
}


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BASELINE_sf1_views_r15.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.tmp_io/sf1"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("bench-view-sf1")
    tmp = tempfile.mkdtemp(prefix="viewsf1_")
    e = table(spark, sf_dir, "events")
    has_docs = os.path.exists(f"{sf_dir}/documents.parquet")
    d = table(spark, sf_dir, "documents") if has_docs else None
    lo, hi = e.agg(F.min("event_id"), F.max("event_id")).first()
    step = (hi - lo) // N_BATCHES + 1

    def slices():
        for i in range(N_BATCHES):
            yield e.where(
                (F.col("event_id") >= lo + i * step)
                & (F.col("event_id") < lo + (i + 1) * step)
            )

    # --- ingest the three stores (untimed: the receipt prices READS) ---
    # compact_every=4: the deployment fold cadence — reads price the
    # MAINTAINED store (O(groups x tiers)), not an unfolded batch pile
    rollup = AggregateStore(
        spark, f"{tmp}/rollup", key_cols=["event_type"], compact_every=4,
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value"),
              "min_value": ("min", "value"), "max_value": ("max", "value")})
    lookup = AggregateStore(
        spark, f"{tmp}/lookup", key_cols=["user_id"], compact_every=4,
        aggs={"cnt": ("count", None), "sum_value": ("sum", "value")})
    join = None if not has_docs else JoinedAggregateView(
        spark, f"{tmp}/join", fk="doc_fk", fact_keys=["event_type"],
        fact_aggs={"cnt": ("count", None), "sum_value": ("sum", "value")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="doc_id",
        compact_every=4)
    if has_docs:
        join.process_dim_batch(d.where("doc_id % 2 = 1"))
    for b in slices():
        rollup.process_batch(b)
        lookup.process_batch(b)
        if has_docs:
            join.process_fact_batch(b.withColumn(
                "doc_fk", F.expr("event_id % 700")))
    if has_docs:
        join.process_dim_batch(d.where("doc_id % 2 = 0"))
    # the factorized-IVM WIN shape: 6M facts against a 10k-key FK grain
    # (lineitem ⋈ supplier, revenue by nation — the q5 sub-shape): the
    # view read merges O(10k x tiers) partial rows while every rescan
    # re-joins all 6M facts. Skipped on events-only datasets (the sf10
    # view receipt ships only the tables its kernels read).
    has_li = os.path.exists(f"{sf_dir}/lineitem.parquet")
    li = table(spark, sf_dir, "lineitem") if has_li else None
    sup = table(spark, sf_dir, "supplier") if has_li else None
    jls = None if not has_li else JoinedAggregateView(
        spark, f"{tmp}/jls", fk="l_suppkey", fact_keys=[],
        fact_aggs={"cnt": ("count", None),
                   "revenue": ("sum", "l_extendedprice * (1 - l_discount)")},
        dim_key="s_suppkey", dim_cols=["s_nationkey"],
        dim_order_by="s_suppkey", compact_every=4)
    if has_li:
        jls.process_dim_batch(sup)
        klo, khi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
        kstep = (khi - klo) // N_BATCHES + 1
        for i in range(N_BATCHES):
            jls.process_fact_batch(li.where(
                (F.col("l_orderkey") >= klo + i * kstep)
                & (F.col("l_orderkey") < klo + (i + 1) * kstep)))

    reads = {
        "rollup_full": lambda: rollup.read(),
        "rollup_lookup": lambda: (
            lookup.read(prune_between={"user_id": (3, 7)})
            .where(F.col("user_id").between(3, 7))),
        **({"join_read": lambda: join.read(["source", "event_type"])}
           if has_docs else {}),
        **({"join_lineitem_supplier": lambda: jls.read(["s_nationkey"])}
           if has_li else {}),
    }
    rescans = {
        "rollup_full": lambda: e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value")),
        "rollup_lookup": lambda: e.where(F.col("user_id").between(3, 7))
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"),
                                F.sum("value").alias("sum_value")),
        **({"join_read": lambda: e.withColumn(
            "doc_fk", F.expr("event_id % 700"))
        .join(d.select("doc_id", "source"),
              F.col("doc_fk") == F.col("doc_id"))
        .groupBy("source", "event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"))} if has_docs else {}),
        **({"join_lineitem_supplier": lambda: li.join(
            sup.select("s_suppkey", "s_nationkey"),
            li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.expr("l_extendedprice * (1 - l_discount)"))
            .alias("revenue"))} if has_li else {}),
    }

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in [t for t, ok in (("events", True), ("documents", has_docs),
                              ("lineitem", has_li), ("supplier", has_li))
              if ok]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    res: dict = {"sf_dir": sf_dir, "n_passes": passes,
                 "n_ingest_batches": N_BATCHES, "kernels": {}}
    try:
        for name in reads:
            vr, sr, dr = [], [], []
            for _ in range(passes):  # interleaved: fair noise exposure
                vr.append(_noop(reads[name]()))
                sr.append(_noop(rescans[name]()))
                t0 = time.perf_counter()
                con.execute(DUCK_SQL[name]).fetch_arrow_table()
                dr.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            res["kernels"][name] = {
                "view_read_s": {"min": min(vr), "passes": vr},
                "spark_rescan_s": {"min": min(sr), "passes": sr},
                "duckdb_rescan_s": {"min": min(dr), "passes": dr},
            }
            print(json.dumps({name: res["kernels"][name]}))
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

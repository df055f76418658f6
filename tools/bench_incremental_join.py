"""Price the incremental JOIN view (r13): JoinedAggregateView.read()
vs re-running the raw join + GROUP BY over both histories (the
counterfactual every dashboard without the view pays) as batches
accumulate on BOTH inputs.

The view read merges the fact's FK-grain partials (O(fk_groups ×
tiers)), joins the dim's latest state (O(dim_keys)) and re-groups —
so its wall should stay ~flat with history AND skip the raw join's
shuffle; the rescan pays a growing scan plus the full fact⋈dim join
every refresh. Per point, interleaved min-of-3.

Usage: python tools/bench_incremental_join.py [out.json] [batches=48]
       [rows=200000] [fks=2000] [dim_rows=2000]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_join import (  # noqa: E402
    JoinedAggregateView,
)


def fact_batch(spark, i: int, rows: int, fks: int):
    return spark.range(i * rows, (i + 1) * rows).select(
        F.pmod(F.hash("id"), F.lit(fks)).alias("fk"),
        F.concat(F.lit("et"), F.pmod(F.hash("id", F.lit(3)), 4)).alias("et"),
        (F.pmod(F.hash("id", F.lit(7)), 10_000) / 100.0).alias("v"),
    )


def dim_batch(spark, i: int, dim_rows: int):
    # every 8th batch re-versions a sliding 1/4 of the dimension
    lo = (i * dim_rows // 4) % dim_rows
    return spark.range(lo, lo + dim_rows // 4).select(
        F.pmod(F.col("id"), F.lit(dim_rows)).alias("doc_id"),
        F.concat(F.lit("src"), F.pmod(F.hash("id", F.lit(i)), 20))
        .alias("source"),
        F.lit(i).alias("ver"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_incremental_join_r13.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    fks = int(sys.argv[4]) if len(sys.argv) > 4 else 2000
    dim_rows = int(sys.argv[5]) if len(sys.argv) > 5 else 2000
    spark = get_spark("bench-incjoin")
    tmp = tempfile.mkdtemp(prefix="incjoin_")
    raw_f, raw_d = f"{tmp}/raw_fact", f"{tmp}/raw_dim"
    view = JoinedAggregateView(
        spark, f"{tmp}/jv", fk="fk", fact_keys=["et"],
        fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
        compact_every=16,
    )
    # seed the full dimension once
    seed = spark.range(0, dim_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), F.pmod(F.hash("id"), 20)).alias("source"),
        F.lit(-1).alias("ver"))
    view.process_dim_batch(seed)
    seed.write.mode("append").parquet(raw_d)
    points = []
    try:
        t_ingest = 0.0
        for i in range(n_batches):
            b = fact_batch(spark, i, rows, fks).persist()
            b.count()
            t0 = time.time()
            view.process_fact_batch(b)
            t_ingest += time.time() - t0
            b.write.mode("append").parquet(raw_f)
            b.unpersist()
            if i % 8 == 7:
                d = dim_batch(spark, i, dim_rows).persist()
                d.count()
                t0 = time.time()
                view.process_dim_batch(d)
                t_ingest += time.time() - t0
                d.write.mode("append").parquet(raw_d)
                d.unpersist()
            if (i + 1) in (n_batches // 4, n_batches // 2, n_batches):
                view_t, rescan_t = [], []
                for _ in range(3):
                    t0 = time.time()
                    view.read(["source", "et"]).collect()
                    view_t.append(time.time() - t0)
                    t0 = time.time()
                    f = spark.read.parquet(raw_f)
                    # latest dim version per key over the raw dim log
                    from pyspark.sql import Window as W

                    d = spark.read.parquet(raw_d)
                    w = W.partitionBy("doc_id").orderBy(F.col("ver").desc())
                    latest = d.withColumn("rk", F.row_number().over(w)) \
                        .where("rk = 1").drop("rk")
                    f.join(latest, f["fk"] == latest["doc_id"]) \
                        .groupBy("source", "et").agg(
                            F.count(F.lit(1)).alias("cnt"),
                            F.sum("v").alias("sum_v")).collect()
                    rescan_t.append(time.time() - t0)
                points.append({
                    "batches": i + 1, "raw_fact_rows": (i + 1) * rows,
                    "view_s": round(min(view_t), 3),
                    "rescan_s": round(min(rescan_t), 3),
                })
        line = {"metric": "incremental_join_view_vs_rescan", "unit": "sec",
                "value": points[-1]["view_s"], "points": points,
                "fks": fks, "dim_rows": dim_rows, "rows_per_batch": rows,
                "ingest_s_total": round(t_ingest, 2)}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps(line))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

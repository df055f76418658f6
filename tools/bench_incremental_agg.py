"""Price the materialized view: AggregateStore.read() vs re-aggregating
the raw history (the counterfactual every pipeline without a view
pays) as batches accumulate.

The view read merges per-batch PARTIALS — O(groups × tiers) rows — so
its wall should stay ~flat with history; the raw re-scan grows
linearly. Synthetic events (g groups, r rows/batch); per point,
interleaved min-of-3 of:

- ``view_s``: store.read() (merge of partials, tiered-compacted log);
- ``rescan_s``: the same GROUP BY over all raw rows so far (raw
  batches kept in a plain parquet dir).

Usage: python tools/bench_incremental_agg.py [out.json] [batches=64]
       [rows=200000] [groups=1000]
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
from doreisa_spark.streaming.incremental_agg import AggregateStore  # noqa: E402

AGGS = {"cnt": ("count", None), "sum_v": ("sum", "v"),
        "min_v": ("min", "v"), "max_v": ("max", "v")}


def batch(spark, i: int, rows: int, groups: int):
    return spark.range(i * rows, (i + 1) * rows).select(
        F.pmod(F.hash("id"), F.lit(groups)).alias("g"),
        (F.pmod(F.hash("id", F.lit(7)), 10_000) / 100.0).alias("v"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_incremental_agg_r12.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    groups = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    spark = get_spark("bench-incagg")
    tmp = tempfile.mkdtemp(prefix="incagg_")
    raw = f"{tmp}/raw"
    store = AggregateStore(spark, f"{tmp}/agg", key_cols=["g"], aggs=AGGS,
                           compact_every=16)
    points = []
    try:
        t_ingest = 0.0
        for i in range(n_batches):
            b = batch(spark, i, rows, groups).persist()
            b.count()
            t0 = time.time()
            store.process_batch(b, i)
            t_ingest += time.time() - t0
            b.write.mode("append").parquet(raw)
            b.unpersist()
            if (i + 1) in (n_batches // 4, n_batches // 2, n_batches):
                view_t, rescan_t = [], []
                for _ in range(3):
                    t0 = time.time()
                    store.read().collect()
                    view_t.append(time.time() - t0)
                    t0 = time.time()
                    spark.read.parquet(raw).groupBy("g").agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.sum("v").alias("sum_v"),
                        F.min("v").alias("min_v"),
                        F.max("v").alias("max_v"),
                    ).collect()
                    rescan_t.append(time.time() - t0)
                points.append({
                    "batches": i + 1, "raw_rows": (i + 1) * rows,
                    "view_s": round(min(view_t), 3),
                    "rescan_s": round(min(rescan_t), 3),
                })
        line = {"metric": "incremental_agg_view_vs_rescan", "unit": "sec",
                "value": points[-1]["view_s"], "points": points,
                "groups": groups, "rows_per_batch": rows,
                "ingest_s_total": round(t_ingest, 2)}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps(line))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Price row-level retraction (r14): a CDC delete batch against a
retractable AggregateStore vs the counterfactual REBUILD (one-pass
re-aggregate of the post-delete raw history — what a view without
retraction pays for every delete).

The retract commits one NEGATED partial (O(touched groups) rows) and
the next read merges it like any other partial — so retract+read
should stay ~flat with history while the rebuild grows with the raw
table. Per point, interleaved min-of-3 for the reads; the retract
itself is timed once per point (it mutates state — we retract three
DISJOINT slices and take the min).

Usage: python tools/bench_retract.py [out.json] [batches=32]
       [rows=500000] [groups=100000]
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


def batch(spark, i: int, rows: int, groups: int):
    return spark.range(i * rows, (i + 1) * rows).select(
        F.pmod(F.hash("id"), F.lit(groups)).alias("k"),
        (F.pmod(F.hash("id", F.lit(7)), 10_000) / 100.0).alias("v"),
        F.col("id"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_retract_r14.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    groups = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000
    spark = get_spark("bench-retract")
    tmp = tempfile.mkdtemp(prefix="retract_")
    raw = f"{tmp}/raw"
    store = AggregateStore(
        spark, f"{tmp}/agg", key_cols=["k"], retractable=True,
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v"),
              "avg_v": ("avg", "v")},
        compact_every=16,
    )
    deleted_mods = []  # which (id % 1009 == m) slices are retracted
    points = []
    try:
        for i in range(n_batches):
            b = batch(spark, i, rows, groups).persist()
            b.count()
            store.process_batch(b.drop("id"))
            b.write.mode("append").parquet(raw)
            b.unpersist()
            if (i + 1) in {max(1, n_batches // 10), n_batches // 4,
                           n_batches // 2, n_batches}:  # a full decade (r15)
                # three disjoint CDC delete slices (~rows/1009 each per
                # ingested batch), timed retract+read, min-of-3
                rts, vts, bts = [], [], []
                for _ in range(3):
                    m = len(deleted_mods) + 1
                    deleted_mods.append(m)
                    # the CDC feed HANDS the pipeline its delete rows;
                    # materialize them before the timer so the receipt
                    # prices the RETRACTION, not the feed's own scan
                    dels = spark.read.parquet(raw).where(
                        f"id % 1009 = {m}").drop("id").persist()
                    dels.count()
                    t0 = time.time()
                    store.process_retract_batch(dels)
                    store.read().count()
                    rts.append(time.time() - t0)
                    # counterfactual: one-pass rebuild over post-delete raw
                    cond = " and ".join(
                        f"id % 1009 != {d}" for d in deleted_mods)
                    t0 = time.time()
                    spark.read.parquet(raw).where(cond).groupBy("k").agg(
                        F.count(F.lit(1)).alias("cnt"),
                        F.sum("v").alias("sum_v"),
                        F.avg("v").alias("avg_v")).count()
                    bts.append(time.time() - t0)
                    t0 = time.time()
                    store.read().count()
                    vts.append(time.time() - t0)
                    dels.unpersist()
                points.append({
                    "batches": i + 1, "raw_rows": (i + 1) * rows,
                    "retract_plus_read_s": round(min(rts), 3),
                    "view_read_s": round(min(vts), 3),
                    "rebuild_s": round(min(bts), 3),
                })
                print(json.dumps(points[-1]))
        line = {"metric": "retract_vs_rebuild", "unit": "sec",
                "value": points[-1]["retract_plus_read_s"],
                "points": points, "groups": groups,
                "rows_per_batch": rows}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps({k: line[k] for k in ("metric", "unit", "value")}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Price exact retractable distinct-counts (r15): a CDC delete batch
against a DistinctView (the support-count arrangement) vs the
counterfactual REBUILD (one-pass count(DISTINCT) over the post-delete
raw history — what exact distinct without the arrangement pays for
every delete).

A delete commits one negated pair-grain partial (O(touched pairs)
rows) and the next read merges it like any other partial — so
retract+read should stay ~flat with history while the rebuild grows
with the raw table. The read here is the full read_distinct()
(pair-grain fold + re-group), so the receipt prices the arrangement's
own 2-exchange read, not a cheaper proxy. Same shape as
tools/bench_retract.py: decade points, interleaved min-of-3 reads,
disjoint delete slices.

Usage: python tools/bench_distinct_view.py [out.json] [batches=32]
       [rows=500000] [groups=1000] [values=20000] [compact_every=4]
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
from doreisa_spark.streaming.incremental_distinct import DistinctView  # noqa: E402


def batch(spark, i: int, rows: int, groups: int, values: int):
    # zipf-ish value skew via hash-of-hash so pair cardinality is
    # realistic (hot values repeat, the tail is thin)
    return spark.range(i * rows, (i + 1) * rows).select(
        F.pmod(F.hash("id"), F.lit(groups)).alias("k"),
        F.pmod(F.hash("id", F.lit(7)), F.lit(values)).alias("v"),
        F.col("id"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_distinct_view.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    groups = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000
    values = int(sys.argv[5]) if len(sys.argv) > 5 else 20_000
    compact_every = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    spark = get_spark("bench-distinct")
    tmp = tempfile.mkdtemp(prefix="distinct_")
    raw = f"{tmp}/raw"
    view = DistinctView(
        spark, f"{tmp}/dv", key_cols=["k"], value_col="v",
        compact_every=compact_every,
    )
    deleted_mods = []
    points = []
    try:
        for i in range(n_batches):
            b = batch(spark, i, rows, groups, values).persist()
            b.count()
            view.process_batch(b.drop("id"))
            b.write.mode("append").parquet(raw)
            b.unpersist()
            if (i + 1) in {max(1, n_batches // 10), n_batches // 4,
                           n_batches // 2, n_batches}:
                rts, vts, bts = [], [], []
                for _ in range(3):
                    m = len(deleted_mods) + 1
                    deleted_mods.append(m)
                    dels = spark.read.parquet(raw).where(
                        f"id % 1009 = {m}").drop("id").persist()
                    dels.count()
                    t0 = time.time()
                    view.process_retract_batch(dels)
                    view.read_distinct().count()
                    rts.append(time.time() - t0)
                    cond = " and ".join(
                        f"id % 1009 != {d}" for d in deleted_mods)
                    t0 = time.time()
                    spark.read.parquet(raw).where(cond).groupBy("k").agg(
                        F.countDistinct("v").alias("d")).count()
                    bts.append(time.time() - t0)
                    t0 = time.time()
                    view.read_distinct().count()
                    vts.append(time.time() - t0)
                    dels.unpersist()
                points.append({
                    "batches": i + 1, "raw_rows": (i + 1) * rows,
                    "retract_plus_read_s": round(min(rts), 3),
                    "view_read_s": round(min(vts), 3),
                    "rebuild_s": round(min(bts), 3),
                })
                print(json.dumps(points[-1]))
        line = {"metric": "distinct_retract_vs_rebuild", "unit": "sec",
                "value": points[-1]["retract_plus_read_s"],
                "points": points, "groups": groups, "values": values,
                "rows_per_batch": rows}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps({k: line[k] for k in ("metric", "unit", "value")}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

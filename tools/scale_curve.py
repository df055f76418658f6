"""Spark-vs-DuckDB scaling curve on compute-heavy registry queries.

BASELINE.md's 3.4x sf1 claim extrapolates "scheduling floor amortizes,
per-row compute partitions" from a two-point line (sf0.1, sf1). This tool
measures the curve directly: each query runs on both engines at each
given sf dir, min-over-passes with raw per-pass times recorded.

    python tools/scale_curve.py out.json passes dir1 dir2 ...

``SCALE_QUERIES`` (comma-separated registry names) overrides the default
two document queries — r7 adds q3_shipping_priority,
join_asof_purchase_click, stream_session_window so the curve covers
join/window shapes, not only map-shaped compute (r6 verdict ask #8).
DuckDB views are registered for every parquet file present in the dir,
so table-subset dirs (SF1_TABLES=... in make_sf1.py) work for any query
whose inputs are present.

Same protocol as tools/baseline_run.py: Spark materializes to a noop sink,
DuckDB runs the registry's own oracle SQL fetched to Arrow.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402

QUERIES = [
    q
    for q in os.environ.get(
        "SCALE_QUERIES", "dedup_minhash_lsh,text_quality_score"
    ).split(",")
    if q
]


def main() -> None:
    out_path = sys.argv[1]
    n_passes = int(sys.argv[2])
    sf_dirs = sys.argv[3:]
    _ensure_loaded()
    qs = {**EXTENDED, **REGISTRY}

    spark = get_spark("scale-curve")
    # JVM + Python-worker warm on the smallest dir
    warm = glob.glob(f"{sf_dirs[0]}/*.parquet")[0]
    spark.read.parquet(warm).count()
    qs[QUERIES[0]].fn(spark, sf_dirs[0]).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    result: dict[str, dict] = {"n_passes": n_passes, "queries": {}}
    for name in QUERIES:
        entry: dict[str, dict] = {}
        for sf_dir in sf_dirs:
            spark_ts, duck_ts = [], []
            for _ in range(n_passes):
                t0 = time.perf_counter()
                qs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                spark_ts.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            con = duckdb.connect()
            con.execute(f"SET threads TO {os.cpu_count() or 8}")
            for pq_path in sorted(glob.glob(f"{sf_dir}/*.parquet")):
                t = os.path.basename(pq_path)[: -len(".parquet")]
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pq_path}')"
                )
            for _ in range(n_passes):
                t0 = time.perf_counter()
                con.execute(qs[name].oracle).fetch_arrow_table()
                duck_ts.append(round(time.perf_counter() - t0, 3))
            con.close()
            entry[sf_dir] = {
                "spark_min": min(spark_ts),
                "duckdb_min": min(duck_ts),
                "spark_passes": spark_ts,
                "duckdb_passes": duck_ts,
                "ratio": round(min(duck_ts) / min(spark_ts), 2),
            }
            print(name, sf_dir, entry[sf_dir], flush=True)
        result["queries"][name] = entry

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()

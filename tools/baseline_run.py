"""Head-to-head Spark vs DuckDB timing on the bench headline queries.

Produces the numbers for BASELINE.md. Both engines run the same logical
query on the same parquet files at the same SF: Spark runs the registered
implementation to a noop sink (all partitions materialized on executors);
DuckDB runs the registry's oracle SQL with results fetched to Arrow (its
equivalent of full materialization). N passes each, min + median reported
— min is the engine's capability on this noisy virtualized box, the
spread is the noise audit.

    python tools/baseline_run.py [sf_dir] [passes]

`tensor_global_sum` is skipped for DuckDB (its oracle is a closed-form
constant, not equivalent work).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from doreisa_spark.catalog import TABLES  # noqa: E402
from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402

NO_ORACLE_WORK = {"tensor_global_sum"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp_io/sf1"
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # Optional extra registry entries timed alongside HEADLINE (round-5
    # verdict ask #10: the BLAS-vs-expression IVF assignment margin as a
    # tracked sf1 number, not a bench-extras footnote).
    extras = [q for q in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if q]
    _ensure_loaded()
    qs = {**EXTENDED, **REGISTRY}
    names = HEADLINE + extras

    # --- Spark ---
    spark = get_spark("baseline")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # JVM warm
    from doreisa_spark.plans.chunked import ChunkedArray, GridMeta, ramp_chunk

    for _ in range(3):  # Python-worker pool + Arrow path warm
        ChunkedArray.from_function(
            spark, GridMeta("warm", (64,), (256,)), ramp_chunk
        ).sum().collect()

    spark_passes: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_passes):
        for name in names:
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            spark_passes[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()

    # --- DuckDB ---
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_passes: dict[str, list[float]] = {}
    for _ in range(n_passes):
        for name in names:
            if name in NO_ORACLE_WORK or qs[name].oracle is None:
                continue
            t0 = time.perf_counter()
            con.execute(qs[name].oracle).fetch_arrow_table()
            duck_passes.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )

    def summarize(p: dict[str, list[float]]) -> dict[str, dict[str, float]]:
        return {
            n: {
                "min": min(ts),
                "median": round(statistics.median(ts), 3),
                "passes": ts,
            }
            for n, ts in p.items()
        }

    out = {
        "sf_dir": sf_dir,
        "n_passes": n_passes,
        "spark": summarize(spark_passes),
        "duckdb": summarize(duck_passes),
        "spark_total_min": round(sum(min(t) for t in spark_passes.values()), 3),
        "duckdb_total_min": round(sum(min(t) for t in duck_passes.values()), 3),
        "spark_total_min_comparable": round(
            sum(min(t) for n, t in spark_passes.items() if n in duck_passes), 3
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

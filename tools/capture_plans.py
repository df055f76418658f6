"""Capture `.explain("formatted")` output per query into plans/<tag>/.

    python tools/capture_plans.py <tag> <suffix> [sf_dir] [names...]

Writes plans/<tag>/<name>_<suffix>.txt for each named query (default: the
bench HEADLINE list plus the bench extras). The formatted plan is the
PRE-execution Catalyst plan (AdaptiveSparkPlan initial); the executed
AQE-final plan string is appended after a marker for queries whose noop
execution is cheap enough to run here (all of them at sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402

BENCH_EXTRAS = [
    "sim_ann_ivf",
    "sim_ann_ivf_blas",
    "sim_ann_store_query_vectors",
    "sim_ann_ivf_store",
    "sim_ann_store_multiprobe",
    "agg_rollup_incremental",
    "agg_join_incremental",
    "agg_retract_distinct",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else HEADLINE + BENCH_EXTRAS

    _ensure_loaded()
    qs = {**EXTENDED, **REGISTRY}
    spark = get_spark("capture-plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = qs[name].fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.write.mode("overwrite").format("noop").save()
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n")
            f.write(formatted)
            f.write("\n\n== AQE-final executed plan ==\n\n")
            f.write(executed)
        print(f"wrote {path}")
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

"""Physical-plan audit across the headline queries (+ named extras).

Prints one markdown table row per query: exchange count, join strategies,
whether a global sort survived (vs TakeOrderedAndProject), Python stage
count, and scan pushdown evidence — the per-round plan-quality audit as a
generated artifact instead of hand-reading .explain() output.

    python tools/plan_audit.py [sf_dir] [extra1,extra2,...]

Counts come from the EXECUTED plan string at the given sf (AQE final).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> dict[str, object]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "py_stages": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    extras = [q for q in (sys.argv[2].split(",") if len(sys.argv) > 2 else []) if q]
    _ensure_loaded()
    qs = {**EXTENDED, **REGISTRY}
    spark = get_spark("plan-audit")

    print("| query | exchanges | broadcast joins | sort-merge joins | top-k via TakeOrdered | python stages | filters pushed |")
    print("|---|---|---|---|---|---|---|")
    for name in HEADLINE + extras:
        df = qs[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # AQE-final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        print(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | "
            f"{'yes' if a['take_ordered'] else '—'} | {a['py_stages']} | "
            f"{'yes' if a['pushed'] else '—'} |"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

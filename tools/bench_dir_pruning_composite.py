"""Price COMPOSITE (two-column) sidecar pruning on the aggregate store
(r12 verdict ask #6).

The store commits partials sorted by its key columns with per-dir/file
min/max for ALL of them; a two-predicate lookup (point-IN on event_type
AND on user_id) lets ``_prune_entries`` drop a dir/file on whichever
column disqualifies it. Structural metric = ``files_planned`` for the
composite probe as the store grows a decade (each round doubles the
ingested batches): O(query), not O(store). The single-column
counterfactuals show why composite matters — either predicate alone
plans strictly more files than both together.

Usage: python tools/bench_dir_pruning_composite.py [out.json]
       [rounds=4] [batches0=8] [rows_per_batch=200000] [n_users=200000]

The r13 receipt proved the PLANNING claim (10 vs 79 files) but its
wall clock was floor-dominated: with n_users=200k the roll-up caps the
partial log at ~1.6M group rows, which 32 cores merge at job-overhead
speed either way. Raising n_users (r14: 2M) grows the unpruned merge
into scan dominance so the LATENCY separation shows on the same curve.
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
from doreisa_spark.streaming import batch_commit as BC  # noqa: E402
from doreisa_spark.streaming.incremental_agg import AggregateStore  # noqa: E402

N_TYPES = 8
N_USERS = 200_000  # default; argv[5] overrides (r14 latency curve: 2M)


def synth(spark, lo: int, n: int, n_users: int = N_USERS):
    # hash-decorrelated keys: every (type, user) combination occurs, so
    # within an event_type span the files really are contiguous user
    # slices (a modulo pair would make type a function of user — the
    # probe would match nothing and the curve would be vacuous)
    return spark.range(lo, lo + n).select(
        F.concat(F.lit("et"),
                 F.pmod(F.hash("id"), F.lit(N_TYPES))).alias("event_type"),
        F.pmod(F.hash("id", F.lit(1)), F.lit(n_users)).alias("user_id"),
        (F.col("id") % 97 * 0.5).alias("v"),
    )


def main() -> None:
    out = (sys.argv[1] if len(sys.argv) > 1
           else "BENCH_dir_pruning_composite_r13.json")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batches0 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rows_per_batch = int(sys.argv[4]) if len(sys.argv) > 4 else 200_000
    n_users = int(sys.argv[5]) if len(sys.argv) > 5 else N_USERS
    spark = get_spark("bench-composite-pruning")
    tmp = tempfile.mkdtemp(prefix="composite_prune_")
    # a TIGHT user cluster: the partials sort by (event_type, user_id), so
    # each file inside an event_type span covers a contiguous user slice
    # — a clustered probe isolates files the type predicate alone cannot
    probe = {"event_type": ["et3"], "user_id": [777, 781, 790]}
    points = []
    try:
        store = AggregateStore(
            spark, f"{tmp}/agg", key_cols=["event_type", "user_id"],
            aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
            compact_every=4, commit_mode=BC.MANIFEST,
            partial_rows_per_file=25_000, target_file_bytes=1 << 19,
        )
        done = 0
        total = batches0
        for _ in range(rounds):
            t0 = time.time()
            while done < total:
                store.process_batch(
                    synth(spark, done * rows_per_batch, rows_per_batch,
                          n_users))
                done += 1
            build_s = time.time() - t0
            root = f"{tmp}/agg/partials"
            files_total = sum(
                1 for d in BC._committed_dirs(root, mode=BC.MANIFEST)
                for f in Path(d).iterdir() if f.suffix == ".parquet"
            )

            def planned(p):
                return len(store.partials(prune_in=p).inputFiles())

            def timed(p):
                ts = []
                for _ in range(3):
                    t = time.time()
                    df = store.read(prune_in=p) if p else store.read()
                    df = df.where(
                        F.col("event_type").isin(probe["event_type"])
                        & F.col("user_id").isin(probe["user_id"]))
                    df.collect()
                    ts.append(time.time() - t)
                return round(min(ts), 3)

            pt = {
                "rows": done * rows_per_batch,
                "build_s": round(build_s, 2),
                "files_total": files_total,
                "files_planned_composite": planned(probe),
                "files_planned_type_only":
                    planned({"event_type": probe["event_type"]}),
                "files_planned_user_only":
                    planned({"user_id": probe["user_id"]}),
                "files_planned_unpruned": planned(None),
                "lookup_s_composite": timed(probe),
                "lookup_s_unpruned": timed(None),
            }
            # result identity: the pruned read + row predicate equals the
            # unpruned read + row predicate
            def rowset(p):
                df = store.read(prune_in=p) if p else store.read()
                return {
                    (r["event_type"], r["user_id"], r["cnt"],
                     round(r["sum_v"], 6))
                    for r in df.where(
                        F.col("event_type").isin(probe["event_type"])
                        & F.col("user_id").isin(probe["user_id"])
                    ).collect()
                }
            base = rowset(None)
            assert base, "probe matched nothing — the curve would be vacuous"
            assert rowset(probe) == base, "pruned read diverged!"
            pt["result_identical"] = True
            pt["result_rows"] = len(base)
            points.append(pt)
            print(json.dumps(pt))
            total *= 2
        line = {"metric": "agg_composite_pruning_curve", "unit": "files",
                "value": points[-1]["files_planned_composite"],
                "probe": probe, "n_users": n_users, "points": points}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps({k: line[k] for k in
                          ("metric", "unit", "value")}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

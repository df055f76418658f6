"""Price directory/file-level data skipping on the persisted IVF store
(r12: batch_commit._stats_write sidecars + read_committed(prune_in=)).

The counterfactual is the r11 read path: row-group min/max pruning only
— Spark still LISTS every committed file and fetches every footer, and
only then skips pages. The sidecar path decides driver-side, from one
tiny JSON per directory, which dirs AND which files of the
range-partitioned folds can contain the probed cells; everything else
is never planned. Locally (warm page cache, no listing latency) the
wall delta is modest by construction — the structural metric is
``files_planned``: on an object store each planned file is a LIST/HEAD
+ footer GET round trip, so planned-files ratio IS the probe's metadata
cost ratio at deployment scale.

Build: ``bulk_batches`` bulk loads of ``bulk_n`` 64-d vectors
(batch_files range partitions each), tiered-compacted with
``target_file_bytes`` so folds stay multi-file; probe =
query_topk_vectors at nprobe=1 over ``cells`` cells, min-of-3.

Usage: python tools/bench_dir_pruning.py [out.json] [bulk_batches=8]
       [bulk_n=100000] [cells=256] [n_queries=2]
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
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402
from doreisa_spark.streaming.vector_store import SortedVectorLog  # noqa: E402

DIM = 64


def synth_vectors(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            "j -> CAST(pmod(hash(id, j), 1000) / 500.0 - 1.0 AS FLOAT))"
        ).alias("embedding"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_dir_pruning_r12.json"
    bulk_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    bulk_n = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    cells = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    n_queries = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    spark = get_spark("bench-dir-pruning")
    tmp = tempfile.mkdtemp(prefix="dirprune_")
    try:
        centroids = [
            (c, [float(x) for x in r["embedding"]])
            for c, r in enumerate(synth_vectors(spark, 10**9, cells).collect())
        ]
        store = IVFVectorStore(
            spark, f"{tmp}/ivf", centroids=centroids, compact_every=4,
            batch_files=8, target_file_bytes=16 << 20,
        )
        t0 = time.time()
        for b in range(bulk_batches):
            store.process_batch(
                synth_vectors(spark, b * bulk_n, bulk_n), b, assign="blas"
            )
        build_s = time.time() - t0
        total_files = sum(
            1 for d in BC._committed_dirs(store._members,
                                          mode=store.commit_mode)
            for f in Path(d).iterdir() if f.suffix == ".parquet"
        )
        queries = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in synth_vectors(spark, 7_000_000, n_queries).collect()
        ]

        def probe():
            return store.query_topk_vectors(queries, 5, nprobe=1,
                                            scoring="blas")

        def files_planned():
            probed = sorted({
                c for _, emb in queries
                for c in store.probe_cells(emb, 1, selection="blas")
            })
            return len(store._pruned_candidates(probed).inputFiles())

        # counterfactual: the r11 read — no sidecar consultation
        unpruned_members = SortedVectorLog.members

        def no_sidecar(self, *, snapshot=None, prune_in=None):
            return unpruned_members(self, snapshot=snapshot)

        res: dict = {"files_total": total_files, "build_s": round(build_s, 2)}
        times: dict = {"sidecar": [], "rowgroup_only": []}
        # interleave the two variants so page-cache/JIT warm-up doesn't
        # bias whichever runs first; min-of-4 each (this box's per-pass
        # noise is 2-10x — BASELINE.md)
        for rnd in range(4):
            for label, patch in (("sidecar", None),
                                 ("rowgroup_only", no_sidecar)):
                if patch is not None:
                    SortedVectorLog.members = patch  # type: ignore
                try:
                    if rnd == 0:
                        res[f"files_planned_{label}"] = files_planned()
                    t0 = time.time()
                    probe().collect()
                    times[label].append(time.time() - t0)
                finally:
                    SortedVectorLog.members = unpruned_members  # type: ignore
        for label, ts in times.items():
            res[f"probe_s_{label}"] = round(min(ts), 3)
        res["queries"] = len(queries)
        res["rows"] = bulk_batches * bulk_n
        res["cells"] = cells
        line = {"metric": "ivf_probe_dir_pruning", "unit": "sec",
                "value": res["probe_s_sidecar"], **res}
        with open(out, "w") as f:
            json.dump(line, f, indent=1)
        print(json.dumps(line))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

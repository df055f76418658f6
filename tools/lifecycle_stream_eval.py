"""End-to-end measured lifecycle: in-stream drift detection -> retrain
-> atomic alias flip (the two r12 pieces QUANTIZER_drift_r11 did not
price — detection LATENCY inside a live stream, and the hand-off
itself).

Protocol (same planted regime as tools/quantizer_drift_eval.py: unit
centers, relative noise 0.33 -> intra-cluster cosine ~0.95; B's
centers offset-shifted before normalization):

1. train a 64-cell quantizer on distribution A, seed a store (blue)
   with A's corpus, record the fit baseline in the quantizer marker;
2. stream files of DRIFTED (B) vectors through foreachBatch with the
   in-stream monitor armed (`on_drift`, compaction cadence
   `compact_every`) — record every verdict, its wall cost, and the
   batch at which the detector first trips;
3. on drain, run `retrain_ivf_store(..., alias_root=, alias=)` — the
   blue/green retrain completed by the CAS alias flip — timing the
   whole step and the flip alone, and verifying readers resolve blue
   before and green after while the blue writer is fenced.

Usage:  python tools/lifecycle_stream_eval.py [out.json] [n_blue] [n_drift] [sample_mod]

``sample_mod`` (optional) arms the monitor with the 1-in-N hash-sampled
fit (drift_sample_mod) — the big-store configuration.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming import alias as AL  # noqa: E402
from doreisa_spark.streaming import batch_commit as BC  # noqa: E402
from doreisa_spark.streaming import quantizer as Q  # noqa: E402
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402

DIM = 64
CLUSTERS = 64
COMPACT_EVERY = 8


def make_files(dirpath: str, n: int, per_file: int, seed: int,
               offset: float, id_from: int, prefix: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    centers = rng.randn(CLUSTERS, DIM).astype(np.float64) + offset
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    files = 0
    for lo in range(0, n, per_file):
        m = min(per_file, n - lo)
        assign = rng.randint(0, CLUSTERS, size=m)
        x = centers[assign] + (0.33 / np.sqrt(DIM)) * rng.randn(m, DIM)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(id_from + lo, id_from + lo + m),
                               pa.int64()),
            "embedding": pa.array([r for r in x.astype(np.float32)],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(m, dtype=np.int32), pa.int32()),
        })
        pq.write_table(tbl, os.path.join(dirpath, f"{prefix}{lo:09d}.parquet"),
                       row_group_size=65536)
        files += 1
    return files


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LIFECYCLE_r12.json"
    n_blue = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    n_drift = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    sample_mod = int(sys.argv[4]) if len(sys.argv) > 4 else None
    per_file = n_drift // 16
    spark = get_spark("lifecycle_stream")
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="lifecycle_", dir=base)
    report: dict = {"n_blue": n_blue, "n_drift": n_drift, "dim": DIM,
                    "clusters": CLUSTERS, "compact_every": COMPACT_EVERY,
                    "per_file": per_file, "drift_sample_mod": sample_mod}
    try:
        seed_dir = f"{scratch}/seed"
        os.makedirs(seed_dir)
        make_files(seed_dir, n_blue, n_blue, seed=1, offset=0.0,
                   id_from=0, prefix="a")
        ea = spark.read.parquet(seed_dir)

        t0 = time.perf_counter()
        cents = Q.train_quantizer(ea.select("vec_id", "embedding"),
                                  CLUSTERS, iters=3)
        report["train_s"] = round(time.perf_counter() - t0, 2)
        print(f"trained {len(cents)} cells in {report['train_s']}s", flush=True)

        blue_root = f"{scratch}/blue"
        aroot = f"{scratch}/aliases"
        verdicts: list[dict] = []
        checks: list[float] = []

        def on_drift(v: dict) -> None:
            checks.append(v.pop("_wall_s", 0.0))
            verdicts.append({"batch_id": v["batch_id"],
                             "drifted": v["drifted"],
                             "mean_cos": v["current"]["mean_cos"],
                             "max_cell_share": v["current"]["max_cell_share"]})
            print(f"  check@batch {v['batch_id']}: drifted={v['drifted']} "
                  f"mean_cos={v['current']['mean_cos']:.4f}", flush=True)

        # manifest mode: the fenceable deployment configuration — the
        # alias flip fences the blue writer through the members manifest
        store = IVFVectorStore(spark, blue_root, centroids=cents,
                               compact_every=COMPACT_EVERY,
                               batch_files=4, commit_mode=BC.MANIFEST,
                               on_drift=on_drift,
                               drift_opts={"min_n": 10_000 // (sample_mod or 1)},
                               drift_sample_mod=sample_mod)
        store.process_batch(ea, 0, assign="blas")
        store.record_fit_baseline(Q.fit_stats(store))
        AL.bind_alias(aroot, "prod", blue_root)
        report["baseline_mean_cos"] = store.fit_baseline["mean_cos"]

        # time each monitor invocation by wrapping _post_compact's fit
        real_post = IVFVectorStore._post_compact

        def timed_post(self, batch_id):
            t = time.perf_counter()
            n_before = len(verdicts)
            real_post(self, batch_id)
            if len(verdicts) > n_before:
                checks[-1] = time.perf_counter() - t
        IVFVectorStore._post_compact = timed_post

        # ---- stream drifted ingest, monitor armed
        src = f"{scratch}/src"
        os.makedirs(src)
        nf = make_files(src, n_drift, per_file, seed=2, offset=1.0,
                        id_from=n_blue, prefix="b")
        from doreisa_spark.streaming.incremental_ann import read_vector_stream
        from doreisa_spark.streaming.structured import run_foreach_batch

        print(f"streaming {nf} drifted files ...", flush=True)
        t0 = time.perf_counter()
        run_foreach_batch(
            read_vector_stream(spark, src),
            lambda df, bid: store.process_batch(df, bid + 1, assign="blas"),
            timeout_sec=1800,
        )
        IVFVectorStore._post_compact = real_post
        report["stream_wall_s"] = round(time.perf_counter() - t0, 2)
        report["stream_files"] = nf
        report["checks"] = verdicts
        report["check_wall_s"] = [round(c, 3) for c in checks]
        tripped = [v for v in verdicts if v["drifted"]]
        report["tripped_at_batch"] = tripped[0]["batch_id"] if tripped else None
        report["vectors_ingested_before_trip"] = (
            (tripped[0]["batch_id"]) * per_file if tripped else None
        )
        print(f"stream done in {report['stream_wall_s']}s; first trip at "
              f"batch {report['tripped_at_batch']}", flush=True)

        # ---- retrain + atomic flip
        assert AL.resolve(aroot, "prod") == blue_root
        green_root = f"{scratch}/green"
        real_flip = AL.flip_alias
        flip_wall = {}

        def timed_flip(*a, **kw):
            t = time.perf_counter()
            out = real_flip(*a, **kw)
            flip_wall["s"] = time.perf_counter() - t
            return out
        AL.flip_alias = timed_flip
        t0 = time.perf_counter()
        new, rep = Q.retrain_ivf_store(
            spark, blue_root, green_root, n_cells=2 * CLUSTERS, iters=3,
            alias_root=aroot, alias="prod",
        )
        AL.flip_alias = real_flip
        report["retrain_total_s"] = round(time.perf_counter() - t0, 2)
        report["flip_s"] = round(flip_wall["s"], 4)
        report["retrain_report"] = {
            "before_mean_cos": rep["before"]["mean_cos"],
            "after_mean_cos": rep["after"]["mean_cos"],
            "n_cells": rep["n_cells"],
            "alias": rep["alias"],
        }
        # readers moved; blue writer fenced
        assert AL.resolve(aroot, "prod") == green_root
        fenced = False
        try:
            store.process_batch(ea.limit(10), 9999)
        except BC.StaleWriterError:
            fenced = True
        report["blue_writer_fenced"] = fenced
        reader = IVFVectorStore.from_alias(spark, aroot, "prod")
        report["green_members"] = reader.members().count()
        print(json.dumps(report, indent=1), flush=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

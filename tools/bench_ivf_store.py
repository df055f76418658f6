"""Probe/ingest latency + scan bytes vs store size for the persisted
IVF-Flat store (r8 verdict ask #3's curve, next to the LSH store's in
BASELINE.md).

Protocol mirrors tools/bench_ann_store.py: JVM-synthesized 64-d
vectors; history bulk-loaded through the store's own parallel
sorted-write path (BLAS assignment — the bulk kernel) then compacted;
per store size, min-of-2:

- ingest_s: process_batch of a fresh 500-vector stream batch
  (oracle-exact expr assignment — must stay flat: history is never
  read on the write path);
- probe_s / probe_blas_s: query_topk_vectors at nprobe=1 (the
  RECALL_r08 headline operating point) — ONE scan pruned to the probed
  cells by row-group min/max on the cell-sorted log;
- full_s: the counterfactual — identical scoring join WITHOUT the cell
  pushdown (scans every member row-group);
- pruned/full scan MB: decoded embedding bytes inside vs outside the
  probed cells — the object-store cost the sort order exists to prune.

The coarse quantizer is the first ``cells`` synthetic vectors (any
fixed set is a valid quantizer; uniform synthetic data means cells are
balanced at ~n/cells members, so the probe fraction is nprobe/cells by
construction — the knob a deployment sizes to its corpus).

Usage: python tools/bench_ivf_store.py [out.json] [max_mult=1000] [cells=256]
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
from pyspark.sql import Window as W  # noqa: E402

from doreisa_spark.operators import vectors as V  # noqa: E402
from doreisa_spark.operators.broadcast import bcast  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402

BATCH = 500
DIM = 64


def synth_vectors(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            "j -> CAST(pmod(hash(id, j), 1000) / 500.0 - 1.0 AS FLOAT))"
        ).alias("embedding"),
    )


def query_full(store: IVFVectorStore, qrows, k: int):
    """The no-pushdown counterfactual: same probe/scoring join, but the
    candidate side scans the whole members log."""
    q = store.spark.createDataFrame(
        qrows, schema="qid bigint, qe array<float>, cell int"
    )
    c = store.members().select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("cell").alias("cc"),
    )
    cos = F.expr(V.cosine_expr("qe", "ce"))
    scored = (
        bcast(q, bounded=True)
        .join(c, (F.col("cc") == F.col("cell")) & (F.col("cid") != F.col("qid")))
        .select("qid", "cid", cos.alias("cos_sim"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def best_of(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = get_spark("bench-ivf-store")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(8 << 20)
    )
    cent_rows = synth_vectors(spark, 10**9, cells).collect()
    centroids = [(i, list(r["embedding"])) for i, r in enumerate(cent_rows)]
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="ivf_store_bench_", dir=base)
    rows = []
    try:
        mult = 1
        while mult <= max_mult:
            hist = BATCH * mult
            root = str(Path(scratch) / f"m{mult}")
            nf = max(1, (hist * 280) // (32 << 20))
            store = IVFVectorStore(spark, root, centroids=centroids,
                                   batch_files=nf)
            store.process_batch(synth_vectors(spark, 0, hist), 0, assign="blas")
            store.batch_files = 1
            queries = [
                (r["vec_id"], r["embedding"])
                for r in store.members().where(F.col("vec_id") < 8).collect()
            ]
            qrows = [
                {"qid": int(qid), "qe": list(emb), "cell": int(c)}
                for qid, emb in queries
                for c in store.probe_cells(emb, 1)
            ]
            ingest_pass = [0]

            def fresh_ingest():
                ingest_pass[0] += 1
                store.process_batch(
                    synth_vectors(spark, hist + ingest_pass[0] * BATCH, BATCH)
                )

            m = store.members()
            probed = sorted({r["cell"] for r in qrows})
            nbytes = F.sum(F.size("embedding") * 4).alias("b")
            pruned_bytes = (
                m.where(F.col("cell").isin(probed)).agg(nbytes).collect()[0]["b"]
            )
            full_bytes = m.agg(nbytes).collect()[0]["b"]
            row = {
                "mult": mult,
                "history_vecs": hist,
                "cells": cells,
                "ingest_s": best_of(fresh_ingest),
                "probe_s": best_of(
                    lambda: store.query_topk_vectors(queries, 5, nprobe=1).count()
                ),
                "probe_blas_s": best_of(
                    lambda: store.query_topk_vectors(
                        queries, 5, nprobe=1, scoring="blas"
                    ).count()
                ),
                "full_s": best_of(lambda: query_full(store, qrows, 5).count()),
                "pruned_scan_mb": round(pruned_bytes / 2**20, 1),
                "full_scan_mb": round(full_bytes / 2**20, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            mult *= 10
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    result = {"batch_vecs": BATCH, "dim": DIM, "cells": cells, "rows": rows}
    line = json.dumps(result)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()

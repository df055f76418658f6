"""Query + ingest latency vs store size for the incremental ANN store.

Companion to tools/bench_incremental_store.py (the dedup store's curve,
BASELINE.md r8): the LSHVectorStore commits bucket-SORTED log segments
and pushes the probed buckets into the candidate scan as a point-IN
filter, so a top-k probe should read O(bucket) embedding bytes — its
cost must stay ~flat while the store grows, where a full-scan probe
grows linearly with the corpus. This tool measures both, plus the
map-only ingest cost, at store sizes 1x/10x/100x/1000x a 500-vector
batch.

Protocol (mirrors the dedup-store bench):
- synthetic 64-d vectors generated INSIDE the JVM (hash-derived
  pseudorandoms — no Python in the data path, no driver materialization);
- history bulk-loaded as one committed batch then compacted to the
  steady folded state (bucket-sorted segment, 1 MiB row groups so
  bench-scale stores have row-group granularity);
- measured per store size, min-of-2 each:
  * ingest_s: process_batch of a fresh 500-vector batch (map-only —
    must be flat);
  * query_pruned_s: query_topk_vectors (application-provided vectors,
    the deployment shape) — the shipped probed-bucket pushdown path;
  * query_full_s: the counterfactual — identical scoring join WITHOUT
    the bucket pushdown (reads every member row-group) — the linear
    term the sorted layout exists to avoid;
  * lookup_topk_s: query_topk (query vectors LOOKED UP in the store
    first) — the extra full nested-column scan that shape pays;
  * scan bytes: decoded embedding bytes of the pruned vs full candidate
    scan (un-timed probes) — the metric that RULES at deployment scale:
    local[32] over tmpfs reads ~2 GB/s so wall time here is floored by
    fixed per-query stage costs, but an object-store/disk deployment
    pays for bytes, and bytes is what the sorted layout prunes.

Output: one JSON line for BASELINE.md.

Usage: python tools/bench_ann_store.py [out.json] [max_mult] [planes] [min_mult]

``min_mult`` (default 1) skips the smaller decades — the 500M row
(max_mult=min_mult=1000000) builds one store only. Stores too big for
/dev/shm (>= 100M vectors ~ 28 GB+ each with scratch headroom) fall
back to /tmp automatically.

``planes`` (default 8, the oracle-tied constant) exercises the
deployment scale knob: more planes → 2^planes buckets → smaller
candidate sets per probe (BASELINE.md's ANN-store section).
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
from doreisa_spark.streaming.incremental_ann import LSHVectorStore  # noqa: E402

BATCH = 500
DIM = 64


def synth_vectors(spark, lo: int, n: int):
    """(vec_id, embedding) rows derived entirely from JVM expressions."""
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            "j -> CAST(pmod(hash(id, j), 1000) / 500.0 - 1.0 AS FLOAT))"
        ).alias("embedding"),
    )


def query_full(store: LSHVectorStore, queries, k: int):
    """query_topk_vectors WITHOUT the probed-bucket pushdown: same local
    query relation and scoring join, but the candidate side scans the
    whole members log — the counterfactual the sorted layout avoids."""
    from doreisa_spark.operators import vectors as VV

    q = store.spark.createDataFrame(
        [
            {
                "qid": int(i),
                "qe": list(e),
                "bucket": VV.lsh_bucket_py(e, store.planes),
            }
            for i, e in queries
        ],
        schema="qid bigint, qe array<float>, bucket bigint",
    )
    m = store.members()
    c = m.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("bucket").alias("cb"),
    )
    cos = F.expr(V.cosine_expr("qe", "ce"))
    scored = (
        bcast(q, bounded=True)
        .join(c, (F.col("cb") == F.col("bucket")) & (F.col("cid") != F.col("qid")))
        .select("qid", "cid", cos.alias("cos_sim"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "cid", F.round("cos_sim", 6).alias("cos_sim"), "rk")
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
    planes = int(sys.argv[3]) if len(sys.argv) > 3 else None
    min_mult = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    spark = get_spark("bench-ann-store")
    # row-group size must be set on the live hadoop conf (a runtime
    # spark.conf.set of spark.hadoop.* does NOT propagate post-start);
    # 8 MiB groups give within-file pruning granularity on big files
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(8 << 20)
    )
    # a 500M-vector store is ~140 GB — bigger than the 126 GB tmpfs;
    # disk-backed /tmp is the honest medium there anyway (bytes pruned
    # is the metric that rules, and disk pays for bytes)
    shm_ok = Path("/dev/shm").is_dir() and max_mult * BATCH < 100_000_000
    scratch = tempfile.mkdtemp(
        prefix="ann_store_bench_", dir="/dev/shm" if shm_ok else None
    )
    rows = []
    try:
        mult = max(1, min_mult)
        while mult <= max_mult:
            hist = BATCH * mult
            root = str(Path(scratch) / f"m{mult}")
            # bulk-load the history through the store's own parallel
            # sorted-write path (batch_files range partitions — the
            # steady compacted layout, ~32 MiB files at ≈280 B/row),
            # then drop to stream-shape single-file batches for the
            # timed ingest passes
            # chunked bulk load: big histories commit as ~25M-vector
            # sub-batches (a 56 GB one-shot repartitionByRange would need
            # store+shuffle on disk simultaneously — past this box's free
            # space), which also makes the store MULTI-SEGMENT, so the
            # probe's row-group pruning is exercised across segments
            chunk = 25_000_000
            store = LSHVectorStore(spark, root, planes=planes)
            lo_id, bid = 0, 0
            while lo_id < hist:
                n = min(chunk, hist - lo_id)
                store.batch_files = max(1, (n * 280) // (32 << 20))
                store.process_batch(synth_vectors(spark, lo_id, n), bid)
                lo_id += n
                bid += 1
            store.batch_files = 1
            # the deployment query shape: application-side vectors,
            # collected ONCE outside the timed region — both paths get
            # the identical local query relation, so the measured
            # difference is purely the candidate scan
            queries = [
                (r["vec_id"], r["embedding"])
                for r in store.members().where(F.col("vec_id") < 8).collect()
            ]
            ingest_pass = [0]

            def fresh_ingest():
                # fresh vec_ids AND a fresh auto batch id per pass — a
                # redelivered batch id would no-op, and reused vec_ids
                # would double rows
                ingest_pass[0] += 1
                store.process_batch(
                    synth_vectors(spark, hist + ingest_pass[0] * BATCH, BATCH)
                )

            n_segments = bid

            # un-timed byte probes: decoded embedding bytes per candidate
            # scan — the deployment-scale cost the pruning targets
            m = store.members()
            probed = sorted({V.lsh_bucket_py(e, store.planes) for _, e in queries})
            nbytes = F.sum(F.size("embedding") * 4).alias("b")
            pruned_bytes = (
                m.where(F.col("bucket").isin(probed)).agg(nbytes).collect()[0]["b"]
            )
            full_bytes = m.agg(nbytes).collect()[0]["b"]
            row = {
                "mult": mult,
                "history_vecs": hist,
                "load_segments": n_segments,
                "ingest_s": best_of(fresh_ingest),
                "query_pruned_s": best_of(
                    lambda: store.query_topk_vectors(queries, 5).count()
                ),
                "query_blas_s": best_of(
                    lambda: store.query_topk_vectors(
                        queries, 5, scoring="blas"
                    ).count()
                ),
                "query_full_s": best_of(lambda: query_full(store, queries, 5).count()),
                "lookup_topk_s": best_of(lambda: store.query_topk(8, 5).count()),
                "pruned_scan_mb": round(pruned_bytes / 2**20, 1),
                "full_scan_mb": round(full_bytes / 2**20, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            mult *= 10
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    result = {
        "batch_vecs": BATCH,
        "dim": DIM,
        "planes": planes or 8,
        "rows": rows,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()

"""Recall × latency for the ANN *store's* planes / n_flip knobs (r8
verdict ask #2: the planes=14 latency row was published without a recall
column, and the store probe had no multiprobe).

For each ``planes`` the tool builds a fresh LSHVectorStore over the
planted-cluster corpus (tools/make_recall_eval.py — the regime ANN
indexes are deployed in), then sweeps the ``n_probes`` deep-multiprobe knob of
``query_topk_vectors`` (the full Lv et al. query-directed sequence —
Hamming-1 alone saturates below recall 0.6 at high plane counts on
this geometry, which is the r8 finding this table exists to expose) and reports per configuration:

- recall@k against the exact brute-force top-k (the registry's own
  ``sim_topk_bruteforce`` ground truth, as the verdict specifies);
  `probed` counts candidate rows summed over per-query sequences (a
  bucket probed by two queries is scanned once but scored twice);
- probe wall time (min of 2, BLAS scoring — the deployment path; the
  expr path returns identical (qid,cid,rk) rows, pinned by pytest);
- candidate rows + decoded embedding bytes actually inside the probed
  buckets (the deployment-scale cost: local tmpfs walls are floored by
  fixed job cost, bytes are what an object store charges for).

The point of the table: planes trades candidate volume for recall loss
at bucket boundaries; n_probes buys the recall back at a measured,
bounded candidate-volume price — the knob pair makes the trade explicit
instead of publishing latency alone.

Usage:
    python tools/make_recall_eval.py .tmp_io/recall_100k 100000
    python tools/recall_store_eval.py .tmp_io/recall_100k [out.json] \
        [planes_csv=8,11,14] [nprobes_csv=0,4,14,64,192]
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

from doreisa_spark.operators import vectors as V  # noqa: E402
from doreisa_spark.queries import similarity as S  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_ann import LSHVectorStore  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".tmp_io/recall_100k"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    planes_list = [
        int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "8,11,14").split(",")
    ]
    nprobes = [
        int(x)
        for x in (
            sys.argv[4] if len(sys.argv) > 4 else "0,4,14,64,192"
        ).split(",")
    ]
    spark = get_spark("recall_store")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(8 << 20)
    )
    k, nq = S._TOP_K, S._N_QUERIES

    # ground truth: the registry's own exact brute-force entry
    bf = {
        (r["qid"], r["cid"])
        for r in S.sim_topk_bruteforce(spark, sf_dir).select("qid", "cid").collect()
    }
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < nq).collect()
    ]

    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="recall_store_", dir=base)
    results = []
    try:
        for planes in planes_list:
            root = str(Path(scratch) / f"p{planes}")
            nf_files = max(1, (n * 280) // (32 << 20))
            store = LSHVectorStore(spark, root, planes=planes,
                                   batch_files=nf_files)
            store.process_batch(e, 0)
            occ = {
                r["bucket"]: (r["n"], r["b"])
                for r in store.members()
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.size("embedding") * 4).alias("b"))
                .collect()
            }
            for n_probes in nprobes:
                probed_per_q = [
                    V.lsh_probe_sequence_py(emb, planes, n_probes)
                    for _, emb in queries
                ]
                probed = {pb for seq in probed_per_q for pb in seq}
                cand = sum(
                    occ.get(b, (0, 0))[0] for seq in probed_per_q for b in seq
                )
                cand_mb = sum(
                    occ.get(b, (0, 0))[1] for seq in probed_per_q for b in seq
                ) / 2**20
                best = None
                got = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    got = (
                        store.query_topk_vectors(
                            queries, k, scoring="blas", n_probes=n_probes
                        )
                        .select("qid", "cid")
                        .collect()
                    )
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                rec = len(bf & {(r["qid"], r["cid"]) for r in got}) / len(bf)
                row = {
                    "planes": planes,
                    "buckets": 2**planes,
                    "n_probes": n_probes,
                    "recall_at_k": round(rec, 3),
                    "probe_s": round(best, 3),
                    "cand_rows": int(cand),
                    "cand_mb": round(cand_mb, 2),
                    "cand_frac": round(cand / (n * nq), 5),
                }
                results.append(row)
                print(f"# {row}", file=sys.stderr)
            shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    report = {
        "dir": sf_dir, "n_vectors": n, "k": k, "n_queries": nq,
        "results": results,
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

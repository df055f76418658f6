"""Reproduce the RECALL_r08 IVF-Flat headline FROM the persisted store
(r8 verdict ask #3's done-criterion): recall@5 = 1.000 at nprobe=1 on
the planted 100k corpus, measured against `sim_topk_bruteforce` ground
truth — but with the cell assignment read from IVFVectorStore's
committed log instead of recomputed per query (the amortization the r8
table assumed, now actual persisted state).

Usage:
    python tools/make_recall_eval.py .tmp_io/recall_100k 100000
    python tools/ivf_store_recall.py .tmp_io/recall_100k [out.json]
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

from doreisa_spark.queries import similarity as S  # noqa: E402
from doreisa_spark.queries.similarity import _seed_centroids  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".tmp_io/recall_100k"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("ivf_store_recall")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(8 << 20)
    )
    k, nq = S._TOP_K, S._N_QUERIES
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    bf = {
        (r["qid"], r["cid"])
        for r in S.sim_topk_bruteforce(spark, sf_dir).select("qid", "cid").collect()
    }
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < nq).collect()
    ]
    cent = [(r["cell"], r["cemb"]) for r in _seed_centroids(e).collect()]
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="ivf_store_", dir=base)
    results = []
    try:
        store = IVFVectorStore(
            spark, f"{scratch}/ivf", centroids=cent,
            batch_files=max(1, (n * 280) // (32 << 20)),
        )
        t0 = time.perf_counter()
        store.process_batch(e, 0)
        build_s = time.perf_counter() - t0
        occ = {
            r["cell"]: r["n"]
            for r in store.members().groupBy("cell").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        for nprobe in (1, 2):
            for scoring in ("blas", "expr"):
                best = got = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    got = (
                        store.query_topk_vectors(
                            queries, k, nprobe=nprobe, scoring=scoring
                        ).select("qid", "cid").collect()
                    )
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                rec = len(bf & {(r["qid"], r["cid"]) for r in got}) / len(bf)
                cand = sum(
                    occ.get(c, 0)
                    for qid, emb in queries
                    for c in store.probe_cells(emb, nprobe)
                )
                row = {
                    "nprobe": nprobe,
                    "scoring": scoring,
                    "recall_at_k": round(rec, 3),
                    "probe_s": round(best, 3),
                    "s_per_query": round(best / nq, 3),
                    "cand_per_query": int(cand / nq),
                    "cand_frac": round(cand / (n * nq), 4),
                }
                results.append(row)
                print(f"# {row}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    report = {
        "dir": sf_dir, "n_vectors": n, "k": k, "n_queries": nq,
        "store_build_s": round(build_s, 2), "results": results,
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

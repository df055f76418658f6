"""Measure the quantizer drift -> detect -> retrain -> recover loop at
scale (r11): the r10 chooser showed a mis-fit IVF quantizer CAPS recall
while its probe cost model breaks; streaming/quantizer.py is the
lifecycle that fixes it. This tool records the whole story as numbers:

1. plant 500k vectors from distribution A (64 gaussian clusters,
   dim=64), train a 64-cell quantizer on A (train_quantizer), bulk-load
   an IVFVectorStore, record fit_stats (the baseline);
2. ingest 500k vectors from a SHIFTED distribution B; record fit_stats
   and the detect_drift verdict;
3. measure recall@5 / scanned-fraction / s/query for B-queries at
   nprobe in {1, 2, 4, 8} on the drifted store;
4. retrain_ivf_store (128 cells — the corpus doubled) and repeat the
   measurements on the green store.

Usage:
    python tools/quantizer_drift_eval.py [out.json] [n_per_dist]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming import quantizer as Q  # noqa: E402
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402

DIM = 64
CLUSTERS = 64
K = 5
N_QUERIES = 64


def make_corpus(path: str, n: int, seed: int, offset: float, id_from: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # the make_recall_eval.py planted regime: unit centers, relative
    # noise radius 0.33 -> intra-cluster cosine ~0.95 (deployment-like
    # neighborhood structure). ``offset`` shifts every center component
    # before normalization, concentrating distribution B's clusters in
    # a narrow region of the sphere FAR from A's spread — the "new
    # domain arrives" drift scenario that funnels B into few A-cells.
    rng = np.random.RandomState(seed)
    centers = rng.randn(CLUSTERS, DIM).astype(np.float64) + offset
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, CLUSTERS, size=n)
    x = centers[assign] + (0.33 / np.sqrt(DIM)) * rng.randn(n, DIM)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(id_from, id_from + n), pa.int64()),
            "embedding": pa.array(
                [row for row in x.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, path, row_group_size=65536)


def measure(store, queries, truth, nprobes) -> list[dict]:
    occ = {r["cell"]: r["n_members"] for r in Q.assignment_fit(store).collect()}
    total = sum(occ.values())
    rows = []
    for nprobe in nprobes:
        t0 = time.perf_counter()
        got = store.query_topk_vectors(
            queries, K, nprobe=nprobe, scoring="blas", selection="blas"
        ).collect()
        wall = time.perf_counter() - t0
        hits = sum((r["qid"], r["cid"]) in truth for r in got)
        scanned = sum(
            sum(occ.get(c, 0) for c in store.probe_cells(emb, nprobe, selection="blas"))
            / total
            for _, emb in queries
        ) / len(queries)
        rows.append(
            {
                "nprobe": nprobe,
                "recall_at_5": round(hits / (len(queries) * K), 4),
                "scanned_frac": round(scanned, 4),
                "s_per_query": round(wall / len(queries), 4),
                "wall_s": round(wall, 2),
            }
        )
        print(f"    nprobe={nprobe}: recall@5={rows[-1]['recall_at_5']}"
              f" scanned={rows[-1]['scanned_frac']}"
              f" s/q={rows[-1]['s_per_query']}", flush=True)
    return rows


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "QUANTIZER_drift_r11.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark("quantizer_drift")
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="qdrift_", dir=base)
    report: dict = {"n_per_dist": n, "dim": DIM, "clusters": CLUSTERS}
    try:
        pa_path, pb_path = f"{scratch}/a.parquet", f"{scratch}/b.parquet"
        make_corpus(pa_path, n, seed=1, offset=0.0, id_from=0)
        make_corpus(pb_path, n, seed=2, offset=1.0, id_from=n)
        ea = spark.read.parquet(pa_path)
        eb = spark.read.parquet(pb_path)

        t0 = time.perf_counter()
        cents = Q.train_quantizer(ea, CLUSTERS, iters=3)
        report["train_s"] = round(time.perf_counter() - t0, 2)
        print(f"trained {len(cents)} cells on A in {report['train_s']}s", flush=True)

        store = IVFVectorStore(
            spark, f"{scratch}/ivf", centroids=cents,
            batch_files=max(1, (n * 280) // (32 << 20)),
        )
        t0 = time.perf_counter()
        store.process_batch(ea, 0, assign="blas")
        report["ingest_a_s"] = round(time.perf_counter() - t0, 2)
        report["fit_baseline"] = Q.fit_stats(store)
        print("baseline fit:", report["fit_baseline"], flush=True)

        t0 = time.perf_counter()
        store.process_batch(eb, 1, assign="blas")
        report["ingest_b_s"] = round(time.perf_counter() - t0, 2)
        report["fit_drifted"] = Q.fit_stats(store)
        verdict = Q.detect_drift(report["fit_baseline"], report["fit_drifted"])
        report["drift_verdict"] = {
            "drifted": verdict["drifted"], "reasons": verdict["reasons"]
        }
        print("drift verdict:", report["drift_verdict"], flush=True)

        qrows = eb.limit(5 * N_QUERIES).collect()[::5][:N_QUERIES]
        queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
        truth = {
            (r["qid"], r["cid"])
            for r in store.query_topk_vectors(
                queries, K, nprobe=len(store.centroids), scoring="blas",
                selection="blas",
            ).collect()
        }
        print("measuring DRIFTED store:", flush=True)
        report["drifted_probe"] = measure(store, queries, truth, (1, 2, 4, 8))

        t0 = time.perf_counter()
        new, rep = Q.retrain_ivf_store(
            spark, store.root, f"{scratch}/ivf_green", n_cells=2 * CLUSTERS,
            iters=3,
        )
        report["retrain_migrate_s"] = round(time.perf_counter() - t0, 2)
        report["fit_after"] = rep["after"]
        print("after fit:", report["fit_after"],
              f"(retrain+migrate {report['retrain_migrate_s']}s)", flush=True)
        truth_new = {
            (r["qid"], r["cid"])
            for r in new.query_topk_vectors(
                queries, K, nprobe=len(new.centroids), scoring="blas",
                selection="blas",
            ).collect()
        }
        print("measuring RETRAINED store (128 cells):", flush=True)
        report["retrained_probe"] = measure(new, queries, truth_new, (1, 2, 4, 8))
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", out_path, flush=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()

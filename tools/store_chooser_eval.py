"""IVF-vs-LSH persisted-store chooser: recall@5 × latency × scanned
fraction × ingest cost on the SAME planted corpus at 1M and 5M vectors
(r9 verdict ask #2).

Both persisted stores (LSHVectorStore / IVFVectorStore — one storage
engine, two index families; streaming/vector_store.py) are built over an
identical planted-cluster corpus (tools/make_recall_eval.py geometry: 16
well-separated unit centers, 64-d, noise radius 0.33 → intra-cluster
cosine ≈ 0.95) and swept over their probe knobs:

- LSH: planes ∈ {11, 14} × n_probes (deep Lv et al. multiprobe)
- IVF: cells ∈ {16 (registry seed contract), 256, 4096} × nprobe;
  quantizers beyond 16 cells are stride-sampled corpus vectors.
  The 4,096-cell store also measures probe-cell SELECTION time fold vs
  blas (r9 verdict ask #4: the pure-Python fold is O(cells×dim) per
  query — the GEMM path is what makes deployment-size quantizers
  usable; both pick identical cells, pinned by pytest).

Per configuration (all walls min-of-2, BLAS scoring — the deployment
path; expr returns identical rows, pytest-pinned):

- recall@5 against the exact brute-force top-k (sim_topk_bruteforce);
- probe_s and s/query over the 8 planted queries;
- cand_frac: candidate rows scored per query / corpus size — the
  scanned fraction an object store bills for (row-group pruning on the
  probe-sorted log makes bytes track this fraction);
- ingest_s: process_batch of a fresh 500-vector stream batch (must be
  flat in history size for both stores — history is never read on the
  write path);
- build_s: one-shot bulk load of the corpus (batch_files sorted write).

The report ends with the CHOOSER: per (scale, family), the cheapest
config meeting each recall target in {0.9, 0.975, 1.0}. Rendered into
BASELINE.md + RECALL_r10.md with the deployment recommendation.

Usage:
    python tools/store_chooser_eval.py [out.json] [sizes_csv=1000000,5000000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from doreisa_spark.queries import similarity as S  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.incremental_ann import LSHVectorStore  # noqa: E402
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore  # noqa: E402

_CELLS = 16    # planted cluster count (make_recall_eval geometry)
_DIM = 64
_NOISE = 0.33
_CHUNK = 500_000


def make_corpus(out_dir: str, n: int, seed: int = 42) -> str:
    """make_recall_eval.make, chunk-streamed so 5M rows don't need one
    5M-element pyarrow list in memory; same geometry and layout
    contracts (queries vec_id<8, seeds 8..23 round-robin)."""
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(_CELLS, _DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())),
         ("label", pa.int32())]
    )
    tmp = f"{path}.tmp{os.getpid()}"
    with pq.ParquetWriter(tmp, schema) as w:
        for lo in range(0, n, _CHUNK):
            hi = min(lo + _CHUNK, n)
            labels = (np.arange(lo, hi) % _CELLS).astype(np.int32)
            noise = rng.normal(size=(hi - lo, _DIM)) * (_NOISE / np.sqrt(_DIM))
            emb = (centers[labels] + noise).astype(np.float32)
            w.write_table(pa.table(
                {
                    "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
                    "label": pa.array(labels),
                },
                schema=schema,
            ))
    os.replace(tmp, path)
    return path


def fresh_batch(spark, lo: int, n: int = 500, seed: int = 7):
    """A stream-sized batch of NEW planted vectors (ids >= corpus)."""
    rng = np.random.default_rng(seed + lo)
    centers = np.random.default_rng(42).normal(size=(_CELLS, _DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(lo, lo + n) % _CELLS
    emb = (centers[labels] + rng.normal(size=(n, _DIM)) * (_NOISE / np.sqrt(_DIM))
           ).astype(np.float32)
    return spark.createDataFrame(
        [(int(lo + i), [float(x) for x in emb[i]]) for i in range(n)],
        schema="vec_id bigint, embedding array<float>",
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
    sizes = [int(x) for x in
             (sys.argv[2] if len(sys.argv) > 2 else "1000000,5000000").split(",")]
    spark = get_spark("store-chooser")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(8 << 20)
    )
    k, nq = S._TOP_K, S._N_QUERIES
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="chooser_", dir=base)
    rows = []
    selection_rows = []
    try:
        for n in sizes:
            sf_dir = f".tmp_io/chooser_{n // 1000}k"
            make_corpus(sf_dir, n)
            e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            bf = {
                (r["qid"], r["cid"])
                for r in S.sim_topk_bruteforce(spark, sf_dir)
                .select("qid", "cid").collect()
            }
            queries = [
                (r["vec_id"], r["embedding"])
                for r in e.where(F.col("vec_id") < nq).collect()
            ]
            nf = max(1, (n * 280) // (32 << 20))

            def measure(store, fam, knobs, probe_fn, cand_rows, build_s, ingest_lo):
                got = None
                probe_s = best_of(lambda: probe_fn().select("qid", "cid").count())
                got = {(r["qid"], r["cid"])
                       for r in probe_fn().select("qid", "cid").collect()}
                passno = [0]

                def ing():
                    passno[0] += 1
                    store.process_batch(
                        fresh_batch(spark, ingest_lo + passno[0] * 500)
                    )

                row = {
                    "n": n, "family": fam, **knobs,
                    "recall_at_5": round(len(bf & got) / len(bf), 3),
                    "probe_s": probe_s,
                    "s_per_query": round(probe_s / nq, 4),
                    "cand_frac": round(cand_rows / (n * nq), 5),
                    "ingest_s": best_of(ing),
                    "build_s": build_s,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

            # ---------------- LSH family
            for planes in (11, 14):
                root = str(Path(scratch) / f"lsh{n}_{planes}")
                store = LSHVectorStore(spark, root, planes=planes,
                                       batch_files=nf)
                t0 = time.monotonic()
                store.process_batch(e, 0)
                build_s = round(time.monotonic() - t0, 1)
                store.batch_files = 1
                occ = {
                    r["bucket"]: r["c"]
                    for r in store.members().groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("c")).collect()
                }
                from doreisa_spark.operators import vectors as V

                for n_probes in (0, 4, 16, 64, 192):
                    cand = sum(
                        occ.get(b, 0)
                        for _, emb in queries
                        for b in V.lsh_probe_sequence_py(emb, planes, n_probes)
                    )
                    measure(
                        store, "lsh",
                        {"planes": planes, "n_probes": n_probes},
                        lambda np_=n_probes: store.query_topk_vectors(
                            queries, k, scoring="blas", n_probes=np_
                        ),
                        cand, build_s, n,
                    )
                shutil.rmtree(root, ignore_errors=True)

            # ---------------- IVF family
            for cells, nprobes in ((16, (1, 2, 4)), (256, (1, 2, 4, 8, 16)),
                                   (4096, (1, 4, 16, 64))):
                if cells == 16:
                    cents = [(r["cell"], r["cemb"])
                             for r in S._seed_centroids(e).collect()]
                else:
                    # stride-sampled quantizer; arithmetic predicate, not a
                    # cells-term IN (big INs overflow the parquet OR-tree)
                    stride = (n - nq) // cells
                    picked = {
                        r["vec_id"]: r["embedding"]
                        for r in e.where(
                            (F.col("vec_id") >= nq)
                            & (F.col("vec_id") < nq + stride * cells)
                            & ((F.col("vec_id") - nq) % stride == 0)
                        ).collect()
                    }
                    cents = [(i, [float(x) for x in picked[nq + i * stride]])
                             for i in range(cells)]
                root = str(Path(scratch) / f"ivf{n}_{cells}")
                store = IVFVectorStore(spark, root, centroids=cents,
                                       batch_files=nf)
                t0 = time.monotonic()
                store.process_batch(e, 0, assign="blas")
                build_s = round(time.monotonic() - t0, 1)
                store.batch_files = 1
                occ = {
                    r["cell"]: r["c"]
                    for r in store.members().groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("c")).collect()
                }
                sel = "blas" if cells > 16 else "fold"
                if cells == 4096:
                    # ask #4's crossover: per-query probe-cell SELECTION
                    emb0 = queries[0][1]
                    srow = {
                        "n": n, "cells": cells,
                        "sel_fold_s_per_q": round(best_of(
                            lambda: [store.probe_cells(emb, 16)
                                     for _, emb in queries]) / nq, 4),
                        "sel_blas_s_per_q": round(best_of(
                            lambda: [store.probe_cells(emb, 16, selection="blas")
                                     for _, emb in queries]) / nq, 5),
                        "agree": store.probe_cells(emb0, 16, selection="blas")
                        == store.probe_cells(emb0, 16),
                    }
                    selection_rows.append(srow)
                    print(json.dumps(srow), flush=True)
                for nprobe in nprobes:
                    cand = sum(
                        occ.get(c, 0)
                        for _, emb in queries
                        for c in store.probe_cells(emb, nprobe, selection=sel)
                    )
                    measure(
                        store, "ivf",
                        {"cells": cells, "nprobe": nprobe},
                        lambda np_=nprobe: store.query_topk_vectors(
                            queries, k, nprobe=np_, scoring="blas",
                            selection=sel,
                        ),
                        cand, build_s, n,
                    )
                shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # ---------------- the chooser
    chooser = []
    for n in sizes:
        for fam in ("lsh", "ivf"):
            for target in (0.9, 0.975, 1.0):
                ok = [r for r in rows
                      if r["n"] == n and r["family"] == fam
                      and r["recall_at_5"] >= target]
                if ok:
                    best = min(ok, key=lambda r: r["probe_s"])
                    chooser.append({"n": n, "family": fam, "target": target,
                                    "best": best})
                else:
                    chooser.append({"n": n, "family": fam, "target": target,
                                    "best": None})
    report = {"k": k, "n_queries": nq, "rows": rows,
              "selection_4096": selection_rows, "chooser": chooser}
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

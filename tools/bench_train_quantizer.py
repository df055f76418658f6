"""Measure the quantizer trainer's sufficient-stats pass at production
IVF sizing (r12 verdict ask #3 "done" criterion): >=4096 cells x 768
dims, where the r11 layout (posexplode -> groupBy(cell, dim) ->
collect) shipped cells x dims Rows (>3M) to the driver per Lloyd
iteration, vs the shipped layout (_cell_stats: map-only fused
assign+partial-sums, grouped Arrow combine) which collects exactly
`cells` rows.

Usage:  python tools/bench_train_quantizer.py [out.json] [n_vectors]

Writes one JSON object with both passes' walls and collected-row
counts, plus an agreement check (per-cell counts identical; centroid
means agree to ~1e-9 — the two layouts sum in different fp orders).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from doreisa_spark.queries.similarity import _ivf_assign_blas  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming.quantizer import _cell_stats  # noqa: E402

DIM = 768
CELLS = 4096
SCRATCH = "/dev/shm/bench_train_quantizer"


def make_corpus(n: int) -> str:
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "corpus.parquet")
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((CELLS, DIM)).astype(np.float32)
    chunk = 25_000
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        which = rng.integers(0, CELLS, hi - lo)
        x = centers[which] + 0.33 / np.sqrt(DIM) * rng.standard_normal(
            (hi - lo, DIM)
        ).astype(np.float32)
        t = pa.table({
            "cid": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "ce": pa.array(list(x.astype(np.float32))),
        })
        pq.write_table(t, os.path.join(path, f"part-{lo:09d}.parquet"))
    return path


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else ".tmp_io/bench_train_quantizer.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("bench_train_quantizer")
    path = make_corpus(n)
    corpus = spark.read.schema("cid bigint, ce array<float>").parquet(path)
    # seed quantizer: first CELLS corpus vectors (sizing is what matters)
    seed_rows = corpus.orderBy("cid").limit(CELLS).collect()
    cents = [
        {"cell": i, "cemb": [float(x) for x in r["ce"]]}
        for i, r in enumerate(seed_rows)
    ]

    # ---- shipped layout: fused map-only pass, collects `cells` rows
    t0 = time.monotonic()
    stats = _cell_stats(cents, corpus)
    new_sec = time.monotonic() - t0
    new_rows = len(stats)

    # ---- r11 layout (reconstructed verbatim for the comparison):
    # assign -> join corpus -> posexplode -> groupBy(cell, dim) ->
    # collect cells x dims Rows
    t0 = time.monotonic()
    assigned = _ivf_assign_blas(cents, corpus)
    old = (
        assigned.join(corpus, "cid")
        .select("cell", F.posexplode("ce").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.sum(F.col("v").cast("double")).alias("s"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    old_sec = time.monotonic() - t0
    old_rows = len(old)

    # ---- agreement: identical membership; means agree to fp-order tol
    by_cell_new = {int(r["cell"]): (int(r["n"]), np.asarray(r["s"])) for r in stats}
    by_cell_old: dict[int, dict] = {}
    for r in old:
        ent = by_cell_old.setdefault(int(r["cell"]), {"n": int(r["n"]), "s": {}})
        ent["s"][int(r["dim"])] = float(r["s"])
    assert set(by_cell_new) == set(by_cell_old), "cell membership differs"
    max_rel = 0.0
    for c, (n_new, s_new) in by_cell_new.items():
        assert n_new == by_cell_old[c]["n"], f"count differs for cell {c}"
        s_old = np.array([by_cell_old[c]["s"][d] for d in range(DIM)])
        rel = float(np.max(np.abs(s_new - s_old) / np.maximum(np.abs(s_old), 1e-12)))
        max_rel = max(max_rel, rel)

    result = {
        "n_vectors": n, "dim": DIM, "cells": CELLS,
        "new_pass_sec": round(new_sec, 3), "new_collect_rows": new_rows,
        "old_pass_sec": round(old_sec, 3), "old_collect_rows": old_rows,
        "collect_rows_ratio": round(old_rows / max(new_rows, 1), 1),
        "speedup": round(old_sec / max(new_sec, 1e-9), 2),
        "max_rel_sum_diff": max_rel,
    }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()

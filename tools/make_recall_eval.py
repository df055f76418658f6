"""Planted-cluster embedding eval set (r6 verdict ask #4).

The driver testdata's synthetic embeddings have weak cluster structure,
so RECALL_r06.md's absolute recalls (0.025–0.275) read as "broken index"
even though the knob ordering is right. This generates an eval corpus in
the regime ANN indexes are actually deployed in — data WITH neighborhood
structure — so the registry's own recall entries can demonstrate the
recall ≥ 0.8 operating point:

- ``_CELLS`` well-separated unit centers in ``_DIM`` dims (random
  Gaussian directions: at 64-d, pairwise center cosines concentrate near
  0, i.e. well separated without hand-placement);
- members = center + isotropic noise at ``_NOISE`` relative radius →
  intra-cluster cosine ≈ 1/sqrt(1+_NOISE²) ≈ 0.95, inter ≈ 0: a query's
  true top-k is inside its cluster, like real embedding corpora;
- layout honors every registry contract: vec_id < 8 are queries
  (clusters 0..7), vec_id 8..23 are the IVF seed-centroid range — one
  member per cluster via the round-robin ``vec_id % _CELLS`` assignment,
  so the seed quantizer already covers all clusters and the Lloyd step
  (sim_ann_ivf_trained) pulls each seed to its cluster mean;
- same schema as the testdata embeddings table (vec_id bigint,
  embedding array<float>, label int), so every sim_* registry entry runs
  unmodified against the output dir.

Deterministic (fixed seed). Usage:

    python tools/make_recall_eval.py [out_dir=.tmp_io/recall_eval] [n=4000]

Then: python tools/recall_eval.py .tmp_io/recall_eval  → RECALL_r07.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_CELLS = 16   # matches queries/similarity.py _IVF_CELLS
_DIM = 64     # matches the testdata embedding dim
_NOISE = 0.33  # relative noise radius → intra-cluster cosine ~0.95


def make(out_dir: str, n: int = 4000, seed: int = 42) -> str:
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(_CELLS, _DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = (np.arange(n) % _CELLS).astype(np.int32)
    noise = rng.normal(size=(n, _DIM)) * (_NOISE / np.sqrt(_DIM))
    emb = (centers[labels] + noise).astype(np.float32)
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else ".tmp_io/recall_eval"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    print(make(out, n))

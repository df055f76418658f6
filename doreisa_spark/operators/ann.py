"""Vectorized (Arrow/numpy) similarity kernels over embedding columns.

The JVM fold in operators/vectors.py is the oracle-exact path; this module
is the wide-batch performance path: whole Arrow batches of embeddings hit
numpy as one (batch × dim) matrix and are scored against the broadcast
query matrix with a single BLAS matmul — the right kernel shape when dim
is large (768–4096) and the per-element SQL fold would dominate.

Scale posture: corpus streams through ``mapInPandas`` (map-only, no
shuffle); each task emits at most ``n_queries × k`` candidate rows, so the
final exact top-k reduction shuffles a bounded, tiny row set regardless of
corpus size — the distributed-top-k pattern (per-partition top-k, then
global top-k).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_topk(
    corpus: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query vector against the corpus.

    ``queries`` is a (n_queries × dim) float array held on the driver and
    broadcast inside the UDF closure (small by contract — a query set, not
    a table). Returns (qid, cid, cos_sim, rk) with rk 1..k per qid.
    """
    q = np.asarray(queries, dtype=np.float64)
    qid = np.asarray(query_ids, dtype=np.int64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            sims = qn @ cn.T  # (n_queries × batch)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            # mask self-matches BEFORE the per-batch top-k so dropping them
            # can never evict a true top-k candidate
            sims[qid[:, None] == cids[None, :]] = -np.inf
            # per-batch top-k per query bounds the emitted rows
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {
                "qid": np.repeat(qid, kk),
                "cid": cids[top].ravel(),
                "cos_sim": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    partials = corpus.mapInPandas(score, schema="qid bigint, cid bigint, cos_sim double")
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        partials.where(F.col("cos_sim") != float("-inf"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )

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
    qnorm = np.linalg.norm(q, axis=1, keepdims=True)
    # zero-norm queries have no defined cosine: the guarded divide keeps
    # them NaN-free (all sims 0 → arbitrary but stable k rows, never
    # contaminating other queries' rankings). Tie-precision note: top-k
    # membership is decided on these BLAS doubles; displayed cos_sim from
    # the SQL fold could disagree on exact k-boundary ties, which the
    # synthetic corpus (no ties, no zero vectors) never produces.
    qn = q / np.where(qnorm > 0, qnorm, 1.0)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cnorm = np.linalg.norm(c, axis=1)
            cn = c / np.where(cnorm > 0, cnorm, 1.0)[:, None]
            sims = qn @ cn.T  # (n_queries × batch)
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            # mask self-matches and zero-norm corpus vectors BEFORE the
            # per-batch top-k: a NaN cosine would sort ABOVE all doubles in
            # Spark and occupy top-k slots ahead of real neighbors, and
            # dropping masked rows later could evict a true candidate
            sims[qid[:, None] == cids[None, :]] = -np.inf
            sims[:, cnorm == 0] = -np.inf
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


def lsh_bucket_udf(planes_a: list[int], planes_b: list[int], mod: int):
    """Sign-LSH bucket assignment as ONE BLAS matmul per Arrow batch:
    bucket bit k = (w_k · v > 0) with integer hyperplane weights
    w_k[i] = ((A_k·(i+1) + B_k) mod M) − M÷2 — the same constants as the
    SQL fold in operators/vectors.py, so buckets agree with the DuckDB
    oracle (projections are O(100); a sign flip would need |proj| ≲ 1e-12,
    far below the integer-weight grid).

    Returns a pandas UDF: array<float> column → int bucket id."""
    import pandas as pd  # noqa: F811  (keep closure self-contained)

    from pyspark.sql.functions import pandas_udf

    n_planes = len(planes_a)
    powers = (2 ** np.arange(n_planes)).astype(np.int64)
    # hyperplane matrix cache: dim is only known from the first batch, so
    # build W once per (executor, dim) and reuse across Arrow batches
    w_by_dim: dict[int, np.ndarray] = {}

    def planes_for(dim: int) -> np.ndarray:
        w = w_by_dim.get(dim)
        if w is None:
            i = np.arange(1, dim + 1)
            w = np.stack(
                [(a * i + b) % mod - mod // 2 for a, b in zip(planes_a, planes_b)]
            ).astype(np.float64)  # (planes × dim)
            w_by_dim[dim] = w
        return w

    @pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int32")
        c = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        proj = c @ planes_for(c.shape[1]).T  # (batch × planes)
        ids = ((proj > 0).astype(np.int64) @ powers).astype(np.int32)
        return pd.Series(ids)

    return bucket

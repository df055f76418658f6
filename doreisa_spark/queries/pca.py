"""Distributed PCA over the embeddings corpus — the dimensionality
reduction / whitening step large-scale embedding pipelines run before
clustering or semantic dedup (e.g. SemDeDup-style pipelines reduce with
PCA before cosine clustering).

Algorithm (the standard big-data PCA shape):

1. ONE distributed pass computes the sufficient statistics — per-partition
   Arrow-batched BLAS partials of (n, Σx, XᵀX) — 64 + 64×64 doubles per
   partition, combined on the driver. Nothing but these tiny partials
   crosses the wire; the corpus is never centered or materialized.
2. The 64×64 covariance eigendecomposition runs on the driver (O(d³) on a
   d=64 matrix is microseconds; this is state, not data — exactly like the
   IVF centroid collect).
3. Projection is a map-only pass: each vector rides through one small GEMM
   against the broadcast component matrix.

At 100 TB nothing changes: step 1 is a map-side tree-reduce, steps 2–3 are
constant-size driver state + a broadcast.

Oracle strategy: the sufficient statistics are exactly SQL-expressible and
gate-checked bit-for-bit (`emb_dim_stats`, the same rounded-sufficient-sum
convention as sim_kmeans_refine). The eigendecomposition itself is NOT
SQL-expressible (iterative LAPACK; a power-iteration SQL was considered
and rejected — this corpus's spectrum is near-flat, λ2/λ1 ≈ 0.99, so it
cannot converge inside a tolerance band), but its INVARIANTS are: the
`emb_pca_project` registry entry emits the eigenvalue sum over the
complete basis and the total variance of the distributed full-basis
projection, both of which must equal the covariance trace that DuckDB
computes exactly from per-dimension moments — a band oracle closes the
loop across engines through two independent distributed passes plus
LAPACK (r7 verdict ask #7). The per-component detail (top-{_PCA_K}
eigenvalues, explained ratios, projected variance ≡ eigenvalue) remains
available as :func:`pca_components` and is pinned by tests/test_pca.py
against an independent numpy closed-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.literal import literal_frame
from doreisa_spark.registry import register

_DIM = 64
_PCA_K = 8


@register(
    "emb_dim_stats",
    extended=True,
    oracle=f"""
SELECT CAST(d.range AS INTEGER) AS dim,
       count(*) AS n,
       round(sum(CAST(embedding[d.range + 1] AS DOUBLE)), 4) AS sum_v,
       round(sum(CAST(embedding[d.range + 1] AS DOUBLE)
                 * CAST(embedding[d.range + 1] AS DOUBLE)), 4) AS sum_sq
FROM embeddings CROSS JOIN range(0, {_DIM}) d
GROUP BY 1
""",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension sufficient statistics of the embedding corpus (count,
    sum, sum of squares) — the exactly-SQL-checkable half of the PCA
    pipeline: means and variances (hence the covariance diagonal) derive
    from these by exact arithmetic on the rounded sums.

    Plan: posexplode → (dim) hash agg with map-side partials — 64 groups,
    so the shuffle carries 64 rows per task regardless of corpus size."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    v = F.col("v").cast("double")
    return (
        e.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(v), 4).alias("sum_v"),
            F.round(F.sum(v * v), 4).alias("sum_sq"),
        )
    )


def _cov_stats(e: DataFrame):
    """One distributed pass → (n, mean vector, covariance matrix) on the
    driver. Per-partition BLAS partials of (n, Σx, XᵀX); only those
    ~4k doubles per partition are collected."""
    import numpy as np

    def partials(batches):
        import pandas as pd

        n = 0
        s = np.zeros(_DIM)
        g = np.zeros((_DIM, _DIM))
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(X):
                n += X.shape[0]
                s += X.sum(axis=0)
                g += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    rows = (
        e.select("embedding")
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(_DIM, _DIM) for r in rows], axis=0)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    return n, mu, cov


def _top_components(cov):
    """Top-{_PCA_K} eigenpairs, deterministically signed (the entry of
    largest magnitude in each eigenvector is made positive — eigh's sign
    is otherwise arbitrary)."""
    import numpy as np

    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:_PCA_K]
    comps = []
    for idx in order:
        vec = v[:, idx]
        j = int(np.abs(vec).argmax())
        if vec[j] < 0:
            vec = -vec
        comps.append((float(w[idx]), vec))
    return comps


def _projection_moments(e: DataFrame, mu, W):
    """Second distributed pass: variance of the corpus projected onto the
    rows of ``W`` (per-partition Arrow-batched moments, combined on the
    driver — the same tiny-partials shape as _cov_stats)."""
    import numpy as np

    bmu = list(mu)
    bW = [list(r) for r in W]
    k = len(bW)

    def project_moments(batches):
        import pandas as pd

        M = np.array(bW)
        m = np.array(bmu)
        cnt = 0
        s1 = np.zeros(k)
        s2 = np.zeros(k)
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            if len(X):
                P = (X - m) @ M.T
                cnt += P.shape[0]
                s1 += P.sum(axis=0)
                s2 += (P * P).sum(axis=0)
        yield pd.DataFrame({"cnt": [cnt], "s1": [s1.tolist()], "s2": [s2.tolist()]})

    rows = (
        e.select("embedding")
        .mapInPandas(
            project_moments, schema="cnt long, s1 array<double>, s2 array<double>"
        )
        .collect()
    )
    cnt = sum(r["cnt"] for r in rows)
    s1 = np.sum([np.asarray(r["s1"]) for r in rows], axis=0)
    s2 = np.sum([np.asarray(r["s2"]) for r in rows], axis=0)
    return s2 / cnt - (s1 / cnt) ** 2


def pca_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA: top-{_PCA_K} principal components of the embedding
    corpus, each reported with its eigenvalue, the variance of the
    actual distributed projection along it, and explained-variance
    ratios.

    The projected-variance column is computed by a SECOND distributed
    pass over the corpus (project → per-dimension moments) and must equal
    the eigenvalue up to float noise — the query carries its own
    end-to-end invariant; tests/test_pca.py pins the numbers against an
    independent numpy closed-loop. The registry gate surface is
    ``emb_pca_project`` (band-checked trace invariants, module
    docstring)."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings", spread=True)
    n, mu, cov = _cov_stats(e)
    comps = _top_components(cov)
    total_var = float(np.trace(cov))
    W = np.array([vec for _, vec in comps])  # (_PCA_K, _DIM)
    proj_var = _projection_moments(e, mu.tolist(), W.tolist())

    cum = 0.0
    out = []
    for k, (ev, _) in enumerate(comps):
        cum += ev / total_var
        out.append(
            (
                f"pc{k}",
                round(ev, 6),
                round(float(proj_var[k]), 6),
                round(ev / total_var, 6),
                round(cum, 6),
            )
        )
    return literal_frame(
        spark, out,
        "component string, eigenvalue double, projected_variance double, "
        "explained_ratio double, cum_explained double",
    )


_TRACE_SQL = f"""
SELECT 'summary' AS component,
       t AS eigensum,
       t AS projected_total,
       t AS total_variance
FROM (
  SELECT sum(sq / n - (s / n) * (s / n)) AS t FROM (
    SELECT count(*) AS n,
           sum(CAST(embedding[d.range + 1] AS DOUBLE)) AS s,
           sum(CAST(embedding[d.range + 1] AS DOUBLE)
               * CAST(embedding[d.range + 1] AS DOUBLE)) AS sq
    FROM embeddings CROSS JOIN range(0, {_DIM}) d
    GROUP BY d.range
  )
)
"""


@register(
    "emb_pca_project", extended=True, band_oracle=_TRACE_SQL, band_rtol=0.001
)
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PCA pipeline's cross-engine gate (r7 verdict ask #7): one
    summary row whose every numeric cell must equal the covariance trace
    DuckDB computes exactly from per-dimension moments —

    - ``eigensum``: Σ of ALL {_DIM} eigenvalues from the driver ``eigh``
      of the distributed sufficient-statistics covariance (checks pass 1
      + the LAPACK decomposition: eigenvalue sum ≡ trace);
    - ``projected_total``: total variance of the corpus projected onto
      the COMPLETE eigenbasis by a second distributed pass (checks the
      projection path end-to-end: an orthonormal basis preserves total
      variance);
    - ``total_variance``: the trace of the pass-1 covariance itself.

    (An earlier ``monotone`` cell — "eigenvalues non-increasing" — was
    dropped per ADVICE r8: the values came from a descending argsort, so
    the check was true by construction and pinned nothing. The ordering
    is pinned where it is falsifiable, against numpy in
    tests/test_pca.py.)

    Per-component detail (not SQL-expressible — see module docstring)
    lives in :func:`pca_components`, pinned by tests/test_pca.py."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings", spread=True)
    n, mu, cov = _cov_stats(e)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    V = v[:, order].T  # complete basis, rows = eigenvectors
    proj_var = _projection_moments(e, mu.tolist(), V.tolist())
    return literal_frame(
        spark,
        [
            (
                "summary",
                float(w.sum()),
                float(proj_var.sum()),
                float(np.trace(cov)),
            )
        ],
        "component string, eigensum double, projected_total double, "
        "total_variance double",
    )

"""Distributed PCA vs an independent numpy closed-loop.

emb_pca_project has no SQL oracle (eigendecomposition is not
SQL-expressible — see queries/pca.py); this is its numeric gate: the
distributed sufficient-statistics pass + driver eigh must reproduce plain
numpy PCA on the collected corpus, and the distributed projection's
variance must equal each eigenvalue (the end-to-end invariant)."""

from __future__ import annotations

import numpy as np

from doreisa_spark.queries import pca

SF_SMALL = "/root/testdata/sf0.001"


def _numpy_pca(spark):
    from doreisa_spark.catalog import table

    rows = table(spark, SF_SMALL, "embeddings").select("embedding").collect()
    X = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    cov = np.cov(X, rowvar=False, bias=True)  # /n, matching _cov_stats
    w = np.linalg.eigvalsh(cov)[::-1]
    return X, cov, w


def test_pca_matches_numpy(spark):
    X, cov, w = _numpy_pca(spark)
    out = {r["component"]: r for r in pca.pca_components(spark, SF_SMALL).collect()}
    assert len(out) == pca._PCA_K
    total = float(np.trace(cov))
    cum = 0.0
    for k in range(pca._PCA_K):
        r = out[f"pc{k}"]
        assert abs(r["eigenvalue"] - w[k]) < 1e-6, (k, r["eigenvalue"], w[k])
        # the distributed projection's variance must equal the eigenvalue
        assert abs(r["projected_variance"] - r["eigenvalue"]) < 1e-6, r
        assert abs(r["explained_ratio"] - w[k] / total) < 1e-6
        cum += w[k] / total
        assert abs(r["cum_explained"] - cum) < 1e-5
    # components are ordered by decreasing variance
    evs = [out[f"pc{k}"]["eigenvalue"] for k in range(pca._PCA_K)]
    assert evs == sorted(evs, reverse=True)


def test_cov_stats_match_numpy(spark):
    from doreisa_spark.catalog import table

    X, cov, _ = _numpy_pca(spark)
    e = table(spark, SF_SMALL, "embeddings")
    n, mu, cov_d = pca._cov_stats(e)
    assert n == len(X)
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)
    assert np.allclose(cov_d, cov, atol=1e-9)


def test_pca_summary_trace_invariants(spark):
    """The band-checked registry entry: every numeric cell equals the
    covariance trace (complete-basis eigenvalue sum, full-basis projected
    total, and the trace itself). The eigenvalue ORDERING is pinned in
    test_pca_components_match_numpy against an independent numpy
    recomputation — the entry's former ``monotone`` cell was true by
    construction and was dropped (ADVICE r8)."""
    _, cov, _ = _numpy_pca(spark)
    row = pca.emb_pca_project(spark, SF_SMALL).collect()[0]
    t = float(np.trace(cov))
    assert abs(row["eigensum"] - t) < 1e-9
    assert abs(row["projected_total"] - t) < 1e-6
    assert abs(row["total_variance"] - t) < 1e-9

"""The vectorized (numpy/BLAS) ANN kernel must agree with the JVM-fold
brute force on rankings — same top-k sets, same order."""

from __future__ import annotations

import numpy as np

from doreisa_spark.catalog import table
from doreisa_spark.operators.ann import cosine_topk
from doreisa_spark.queries.similarity import sim_topk_bruteforce

from conftest import SF_SMALL


def test_cosine_topk_matches_jvm_bruteforce(spark):
    e = table(spark, SF_SMALL, "embeddings")
    qrows = sorted(
        e.where("vec_id < 8").select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows])
    qvecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])

    fast = cosine_topk(e, qvecs, qids, k=5)
    ref = sim_topk_bruteforce(spark, SF_SMALL)

    f = {(r["qid"], r["rk"]): r["cid"] for r in fast.collect()}
    r = {(r["qid"], r["rk"]): r["cid"] for r in ref.collect()}
    assert f == r

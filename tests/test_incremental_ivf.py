"""Persisted IVF-Flat vector store ≡ the batch IVF oracle (r8 verdict
ask #3).

Contracts: batch equivalence vs the DuckDB-gated `sim_ann_ivf` in a
shuffled batch split; driver-side probe selection bit-agrees with the
JVM fold; BLAS scoring agrees with the fold path; exactly-once on
redelivery in BOTH commit modes; the quantizer marker is write-once
(reopen adopts it, a different quantizer raises); tombstone deletes
mask the index before and after compaction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.queries.similarity import (
    _IVF_NPROBE,
    _N_QUERIES,
    _TOP_K,
    _seed_centroids,
    sim_ann_ivf,
)
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore, fold_cosine_py

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return {(r["qid"], r["cid"], r["cos_sim"], r["rk"]) for r in df.collect()}


def _corpus(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _centroids(spark):
    e = _corpus(spark)
    return [(r["cell"], r["cemb"]) for r in _seed_centroids(e).collect()]


def _queries(spark):
    e = _corpus(spark)
    return [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < _N_QUERIES).collect()
    ]


def test_store_equals_batch_in_shuffled_split(spark, tmp_path):
    e = _corpus(spark)
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    for i in range(3):  # interleaved, non-monotone arrival
        store.process_batch(e.where(F.col("vec_id") % 3 == (2 - i)), i)
    got = store.query_topk_vectors(_queries(spark), _TOP_K, nprobe=_IVF_NPROBE)
    assert _rows(got) == _rows(sim_ann_ivf(spark, SF_SMALL))
    # every vector exactly once, in exactly one cell
    n = e.count()
    assert store.members().count() == n
    assert store.members().select("vec_id").distinct().count() == n


def test_probe_cells_bit_agree_with_jvm(spark, tmp_path):
    """Driver-side nprobe selection == the JVM fold's row_number probe
    selection, for every query vector and both nprobe values."""
    from doreisa_spark.operators import vectors as V
    from pyspark.sql import Window as W

    e = _corpus(spark)
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    cent = _seed_centroids(e)
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pw = W.partitionBy("qid").orderBy(F.col("p_cos").desc(), F.col("cell"))
    for nprobe in (1, 2, 4):
        jvm = {}
        for r in (
            q.crossJoin(cent)
            .select("qid", "cell", F.expr(V.cosine_expr("qe", "cemb")).alias("p_cos"))
            .withColumn("prnk", F.row_number().over(pw))
            .where(F.col("prnk") <= nprobe)
            .collect()
        ):
            jvm.setdefault(r["qid"], []).append((r["prnk"], r["cell"]))
        for qid, emb in _queries(spark):
            expect = [c for _, c in sorted(jvm[qid])]
            assert store.probe_cells(emb, nprobe) == expect


def test_probe_cells_blas_agrees_with_fold(spark, tmp_path):
    """selection='blas' (one GEMM over the quantizer, the large-cell-count
    path) picks the identical probe-cell sequence as the oracle fold —
    on the seed quantizer for every query, and on a 512-cell random
    quantizer (the regime the vectorized path exists for)."""
    import numpy as np

    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    for nprobe in (1, 2, 4):
        for qid, emb in _queries(spark):
            assert store.probe_cells(emb, nprobe, selection="blas") == \
                store.probe_cells(emb, nprobe)
    rng = np.random.default_rng(7)
    big = [
        (int(c), [float(x) for x in rng.standard_normal(64).astype(np.float32)])
        for c in range(512)
    ]
    big_store = IVFVectorStore(spark, str(tmp_path / "big"), centroids=big)
    for q in rng.standard_normal((25, 64)).astype(np.float32):
        emb = [float(x) for x in q]
        for nprobe in (1, 8, 64):
            assert big_store.probe_cells(emb, nprobe, selection="blas") == \
                big_store.probe_cells(emb, nprobe)
    with pytest.raises(ValueError, match="selection"):
        store.probe_cells(_queries(spark)[0][1], 1, selection="nope")


def test_query_selection_blas_end_to_end(spark, tmp_path):
    e = _corpus(spark)
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    store.process_batch(e, 0)
    qs = _queries(spark)
    fold = store.query_topk_vectors(qs, _TOP_K, nprobe=2)
    blas = store.query_topk_vectors(qs, _TOP_K, nprobe=2, selection="blas")
    assert _rows(fold) == _rows(blas)


def test_blas_scoring_matches_expr(spark, tmp_path):
    e = _corpus(spark)
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    store.process_batch(e, 0)
    qs = _queries(spark)
    expr = store.query_topk_vectors(qs, _TOP_K, nprobe=2)
    blas = store.query_topk_vectors(qs, _TOP_K, nprobe=2, scoring="blas")
    assert {(r["qid"], r["cid"], r["rk"]) for r in expr.collect()} == {
        (r["qid"], r["cid"], r["rk"]) for r in blas.collect()
    }
    with pytest.raises(ValueError, match="scoring"):
        store.query_topk_vectors(qs, _TOP_K, scoring="nope")


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_redelivery_is_noop_both_modes(spark, tmp_path, mode):
    e = _corpus(spark)
    store = IVFVectorStore(
        spark, str(tmp_path / "ivf"), centroids=_centroids(spark), commit_mode=mode
    )
    store.process_batch(e.where(F.col("vec_id") < 100), 0)
    store.process_batch(e.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)), 1)
    n = store.members().count()
    top = _rows(store.query_topk_vectors(_queries(spark), _TOP_K, nprobe=2))
    store.process_batch(e.where(F.col("vec_id") < 100), 0)  # redelivery
    assert store.members().count() == n
    assert _rows(store.query_topk_vectors(_queries(spark), _TOP_K, nprobe=2)) == top


def test_quantizer_marker_write_once(spark, tmp_path):
    e = _corpus(spark)
    cents = _centroids(spark)
    root = str(tmp_path / "ivf")
    store = IVFVectorStore(spark, root, centroids=cents)
    store.process_batch(e.where(F.col("vec_id") < 100), 0)
    # reopen WITHOUT centroids: adopts the marker
    reopened = IVFVectorStore(spark, root)
    assert reopened.centroids == store.centroids
    # reopen WITH the same centroids: fine
    IVFVectorStore(spark, root, centroids=cents)
    # a different quantizer must be refused
    other = [(c, [x + 1.0 for x in emb]) for c, emb in cents]
    with pytest.raises(ValueError, match="quantizer"):
        IVFVectorStore(spark, root, centroids=other)
    # a NEW store without centroids must be refused
    with pytest.raises(ValueError, match="centroids"):
        IVFVectorStore(spark, str(tmp_path / "fresh"))


def test_delete_vectors_masks_index(spark, tmp_path):
    e = _corpus(spark)
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=_centroids(spark))
    store.process_batch(e, 0)
    qs = _queries(spark)
    top0 = store.query_topk_vectors(qs, _TOP_K, nprobe=2).collect()
    victim = int(top0[0]["cid"])
    store.delete_vectors([victim], 1)
    top1 = store.query_topk_vectors(qs, _TOP_K, nprobe=2).collect()
    assert all(r["cid"] != victim for r in top1)
    BC.compact(spark, store._members,
               "cell int, vec_id bigint, embedding array<float>",
               keep_last=1, order_by=["cell"])
    assert sorted(map(tuple, store.query_topk_vectors(qs, _TOP_K, nprobe=2).collect())) \
        == sorted(map(tuple, top1))


def test_fold_cosine_py_matches_jvm(spark):
    from doreisa_spark.operators import vectors as V

    e = _corpus(spark).limit(6).collect()
    a, rest = e[0]["embedding"], e[1:]
    jvm = spark.createDataFrame(
        [(a, r["embedding"]) for r in rest], "x array<float>, y array<float>"
    ).select(F.expr(V.cosine_expr("x", "y")).alias("c")).collect()
    for r, j in zip(rest, jvm):
        assert fold_cosine_py(a, r["embedding"]) == j["c"]  # bit-identical


def test_blas_ingest_matches_expr_ingest(spark, tmp_path):
    """assign='blas' (bulk-load GEMM argmax) produces the identical
    (cell, vec_id) assignment and identical query results as the
    oracle-exact expr fold on this corpus (no centroid-cosine ties)."""
    e = _corpus(spark)
    cents = _centroids(spark)
    s_expr = IVFVectorStore(spark, str(tmp_path / "x"), centroids=cents)
    s_blas = IVFVectorStore(spark, str(tmp_path / "b"), centroids=cents)
    s_expr.process_batch(e, 0)
    s_blas.process_batch(e, 0, assign="blas")
    a = sorted(
        (r["cell"], r["vec_id"]) for r in s_expr.members().select("cell", "vec_id").collect()
    )
    b = sorted(
        (r["cell"], r["vec_id"]) for r in s_blas.members().select("cell", "vec_id").collect()
    )
    assert a == b
    qs = _queries(spark)
    assert _rows(s_expr.query_topk_vectors(qs, _TOP_K, nprobe=2)) == _rows(
        s_blas.query_topk_vectors(qs, _TOP_K, nprobe=2)
    )
    with pytest.raises(ValueError, match="assign"):
        s_blas.process_batch(e, 5, assign="nope")


def test_real_stream_equals_batch(spark, tmp_path):
    """A REAL readStream + foreachBatch drive (one parquet file per
    trigger, the LSH store's stream-equivalence shape) accumulates an
    IVF store whose probe equals the one-shot sim_ann_ivf oracle entry."""
    import os

    from doreisa_spark.streaming.incremental_ivf import run_incremental_ivf

    e = _corpus(spark)
    src = tmp_path / "vecs_in"
    src.mkdir()
    for i in range(3):
        part = e.where(F.col("vec_id") % 3 == i)
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    got = run_incremental_ivf(
        spark, str(src), str(tmp_path / "store"),
        centroids=_centroids(spark), queries=_queries(spark),
        k=_TOP_K, nprobe=_IVF_NPROBE,
    )
    assert _rows(got) == _rows(sim_ann_ivf(spark, SF_SMALL))


def test_expr_assignment_matches_crossjoin_argmax(spark, tmp_path):
    """The map-only argmax expression (r16) must assign every vector to
    exactly the cell the former crossJoin + row_number shape chose —
    same fold arithmetic, same (cos DESC, cell ASC) tie-break, float32
    centroid truncation included. Verified over the real corpus plus a
    planted exact tie (duplicate centroid under two cells: lowest cell
    must win in both formulations)."""
    from pyspark.sql import Window as W

    from doreisa_spark.catalog import table
    from doreisa_spark.operators import vectors as V
    from doreisa_spark.operators.broadcast import bcast
    from doreisa_spark.operators.literal import literal_frame
    from doreisa_spark.queries.similarity import _seed_centroids

    e = table(spark, SF_SMALL, "embeddings")
    cent = [
        (int(r["cell"]), [float(x) for x in r["cemb"]])
        for r in _seed_centroids(e).collect()
    ]
    # planted exact tie: cell 99 duplicates cell 0's centroid — every
    # vector whose argmax is cell 0 must still land on 0, never 99
    cent.append((99, list(cent[0][1])))
    vecs = e.select("vec_id", "embedding")
    from doreisa_spark.operators.literal import centroid_arg_frame

    cents1 = centroid_arg_frame(spark, cent, cell_type="int")
    maponly = (
        vecs.crossJoin(bcast(cents1, bounded=True))
        .select(
            "vec_id",
            F.expr(V.ivf_argmax_cell_expr("cents", "embedding")).alias("cell"),
        )
    )
    cent_df = literal_frame(spark, sorted(cent), "cell int, cemb array<float>")
    aw = W.partitionBy("vec_id").orderBy(F.col("a_cos").desc(), F.col("cell"))
    ref = (
        vecs.crossJoin(bcast(cent_df, bounded=True))
        .select(
            "vec_id", "cell",
            F.expr(V.cosine_expr("embedding", "cemb")).alias("a_cos"),
        )
        .withColumn("arnk", F.row_number().over(aw))
        .where("arnk = 1")
        .select("vec_id", "cell")
    )
    assert maponly.exceptAll(ref).count() == 0
    assert ref.exceptAll(maponly).count() == 0
    assert not any(r["cell"] == 99 for r in maponly.collect())

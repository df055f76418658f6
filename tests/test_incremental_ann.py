"""Streaming-incremental sign-LSH ANN index ≡ the batch oracle.

Vectors stream in as three parquet files through readStream +
foreachBatch; querying the accumulated store must equal `sim_ann_lsh`
(DuckDB-gated) row for row — in a SHUFFLED arrival order, proving the
stateless-bucketing claim that order cannot matter."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.queries.similarity import _N_QUERIES, _TOP_K, sim_ann_lsh
from doreisa_spark.streaming.incremental_ann import (
    LSHVectorStore,
    run_incremental_ann,
)

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return {(r["qid"], r["cid"], r["cos_sim"], r["rk"]) for r in df.collect()}


@pytest.fixture()
def vec_stream_dir(spark, tmp_path):
    """Embeddings split into 3 files by vec_id MODULO (interleaved — a
    deliberately non-monotone arrival order)."""
    src = tmp_path / "vecs_in"
    src.mkdir()
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for i in range(3):
        part = e.where(F.col("vec_id") % 3 == i)
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    return str(src)


def test_stream_index_equals_batch(spark, tmp_path, vec_stream_dir):
    got = run_incremental_ann(
        spark, vec_stream_dir, str(tmp_path / "store"),
        query_ids_below=_N_QUERIES, k=_TOP_K,
    )
    expect = sim_ann_lsh(spark, SF_SMALL)
    assert _rows(got) == _rows(expect)
    # the store retains every vector exactly once
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert store.members().count() == n
    assert store.members().select("vec_id").distinct().count() == n


def test_query_topk_vectors_matches_lookup(spark, tmp_path):
    """The deployment query shape (application-provided vectors,
    query_topk_vectors) returns row-for-row what the store-lookup shape
    returns — which requires the driver-side bucketing to bit-agree
    with the JVM ingest expression for every query vector."""
    from doreisa_spark.operators import vectors as V

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    store.process_batch(e, 0)
    # driver-side bucket mirror == JVM expression, on every corpus vector
    jvm = {
        r["vec_id"]: r["b"]
        for r in e.select(
            "vec_id", F.expr(V.lsh_bucket_expr("embedding")).alias("b")
        ).collect()
    }
    emb = {r["vec_id"]: r["embedding"] for r in e.collect()}
    assert all(V.lsh_bucket_py(emb[v]) == jvm[v] for v in jvm)
    queries = [(v, emb[v]) for v in sorted(emb) if v < _N_QUERIES]
    got = store.query_topk_vectors(queries, _TOP_K)
    expect = store.query_topk(_N_QUERIES, _TOP_K)
    assert _rows(got) == _rows(expect)


def test_blas_scoring_matches_expr(spark, tmp_path):
    """scoring='blas' (GEMM kernel, per-bucket masked) ranks the same
    neighbors as the oracle-exact fold path: identical (qid, cid, rk)
    and cosines equal to 1e-9 (the BLAS sum order may differ in the
    last ulps — ann.py's documented tie caveat; this corpus has no
    exact ties, so ranks cannot flip)."""
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    store.process_batch(e, 0)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < _N_QUERIES).collect()
    ]
    expr_rows = {
        (r["qid"], r["cid"], r["rk"]): r["cos_sim"]
        for r in store.query_topk_vectors(queries, _TOP_K).collect()
    }
    blas_rows = {
        (r["qid"], r["cid"], r["rk"]): r["cos_sim"]
        for r in store.query_topk_vectors(
            queries, _TOP_K, scoring="blas"
        ).collect()
    }
    assert expr_rows.keys() == blas_rows.keys()
    assert all(abs(expr_rows[k] - blas_rows[k]) < 1e-9 for k in expr_rows)


def test_planes_knob(spark, tmp_path):
    """The deployment scale knob: planes=12 → 4096 buckets with the SAME
    store layout and probe (BASELINE.md's ANN-store scale note, as code).
    Pins (1) JVM-12 ≡ driver-12 bucketing on every vector, (2) bucket
    count grows / mean occupancy shrinks vs the 8-plane default, (3) the
    probe returns exactly the fold-exact top-k computed per-bucket by a
    python reference, (4) a reopened store adopts its recorded plane
    count, (5) a mismatched writer raises."""
    from collections import Counter

    from doreisa_spark.operators import vectors as V

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "s12"), planes=12)
    store.process_batch(e, 0)
    emb = {r["vec_id"]: r["embedding"] for r in e.collect()}
    jvm = {
        r["vec_id"]: r["bucket"]
        for r in store.members().select("vec_id", "bucket").collect()
    }
    assert jvm.keys() == emb.keys()
    assert all(V.lsh_bucket_py(emb[v], 12) == b for v, b in jvm.items())
    c8 = Counter(V.lsh_bucket_py(v) for v in emb.values())
    c12 = Counter(jvm.values())
    assert len(c12) > len(c8)  # occupancy spreads over more buckets

    def fold_cos(a, b):
        # the oracle fold: float32 elements, double sequential left fold
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return dot / (na**0.5 * nb**0.5)

    queries = [(v, emb[v]) for v in sorted(emb) if v < _N_QUERIES]
    expect = {}
    for qid, qe in queries:
        cands = [v for v in emb if jvm[v] == jvm[qid] and v != qid]
        scored = sorted(
            ((fold_cos(qe, emb[c]), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:_TOP_K]
        for rk, (cos, cid) in enumerate(scored, 1):
            expect[(qid, cid, rk)] = cos
    got = {
        (r["qid"], r["cid"], r["rk"]): r["cos_sim"]
        for r in store.query_topk_vectors(queries, _TOP_K).collect()
    }
    assert got.keys() == expect.keys()
    assert all(abs(got[k] - expect[k]) < 1e-6 for k in got)  # got is round(6)

    reopened = LSHVectorStore(spark, str(tmp_path / "s12"))
    assert reopened.planes == 12
    with pytest.raises(ValueError, match="planes"):
        LSHVectorStore(spark, str(tmp_path / "s12"), planes=8)


def test_batch_files_parallel_sorted_write(spark, tmp_path):
    """batch_files=4 (bulk-load shape) commits 4 range-partitioned
    sorted files whose query results are row-identical to the
    single-file stream shape — the parallel write must preserve the
    bucket-sorted layout the probe's row-group pruning relies on."""
    import glob

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    s1 = LSHVectorStore(spark, str(tmp_path / "one"))
    s4 = LSHVectorStore(spark, str(tmp_path / "four"), batch_files=4)
    s1.process_batch(e, 0)
    s4.process_batch(e, 0)
    files = glob.glob(str(tmp_path / "four" / "members" / "b*" / "*.parquet"))
    assert len(files) == 4
    # each file holds a contiguous, sorted bucket range
    prev_hi = None
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).select("bucket").toPandas()
        assert pdf["bucket"].is_monotonic_increasing
        ranges.append((pdf["bucket"].min(), pdf["bucket"].max()))
    for lo, hi in sorted(ranges):
        assert prev_hi is None or lo >= prev_hi
        prev_hi = hi
    assert _rows(s4.query_topk(_N_QUERIES, _TOP_K)) == _rows(
        s1.query_topk(_N_QUERIES, _TOP_K)
    )


def test_multiprobe_recall_knob(spark, tmp_path):
    """n_flip (r8 verdict ask #2): probing Hamming-1 neighbor buckets by
    smallest margin first. Pins (1) the candidate-superset property —
    every n_flip=0 result survives, result sets grow monotonically with
    n_flip; (2) n_flip=planes equals the batch sim_ann_multiprobe
    semantics (the oracle-gated sim_ann_store_multiprobe entry carries
    the DuckDB hash check; here the full-flip store probe vs the batch
    operator directly); (3) the BLAS path agrees under multiprobe;
    (4) recall vs brute force never decreases with n_flip."""
    from doreisa_spark.queries.similarity import sim_ann_multiprobe, sim_topk_bruteforce

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    store.process_batch(e, 0)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < _N_QUERIES).collect()
    ]
    bf = {
        (r["qid"], r["cid"])
        for r in sim_topk_bruteforce(spark, SF_SMALL).collect()
    }
    per_flip = {}
    prev_recall = -1.0
    for nf in (0, 2, store.planes):
        got = store.query_topk_vectors(queries, _TOP_K, n_flip=nf)
        pairs = {(r["qid"], r["cid"]) for r in got.collect()}
        per_flip[nf] = pairs
        recall = len(pairs & bf) / len(bf)
        assert recall >= prev_recall, f"recall dropped at n_flip={nf}"
        prev_recall = recall
    full = store.query_topk_vectors(queries, _TOP_K, n_flip=store.planes)
    batch = sim_ann_multiprobe(spark, SF_SMALL)
    assert _rows(full) == _rows(batch)
    # BLAS agreement under multiprobe
    blas = store.query_topk_vectors(queries, _TOP_K, n_flip=2, scoring="blas")
    expr = store.query_topk_vectors(queries, _TOP_K, n_flip=2)
    assert {(r["qid"], r["cid"], r["rk"]) for r in blas.collect()} == {
        (r["qid"], r["cid"], r["rk"]) for r in expr.collect()
    }


def test_probe_bucket_ordering_by_margin(spark):
    """lsh_probe_buckets_py flips the smallest-|projection| planes first
    and reproduces the base bucket as element 0."""
    from doreisa_spark.operators import vectors as V

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(5).collect()
    for r in e:
        emb = r["embedding"]
        projs = V.lsh_projections_py(emb)
        base = V.lsh_bucket_py(emb)
        probes = V.lsh_probe_buckets_py(emb, n_flip=V.LSH_PLANES)
        assert probes[0] == base
        assert len(probes) == V.LSH_PLANES + 1 == len(set(probes))
        flipped_bits = [
            (p ^ base).bit_length() - 1 for p in probes[1:]
        ]
        margins = [abs(projs[b]) for b in flipped_bits]
        assert margins == sorted(margins)
        assert V.lsh_probe_buckets_py(emb, n_flip=0) == [base]


def test_probe_sequence_deep_multiprobe(spark):
    """lsh_probe_sequence_py (the n_probes knob): probes are distinct,
    begin at the base bucket, come out in nondecreasing
    sum-of-flipped-|margin| order (the Lv et al. success-probability
    order), and enumerate the whole bucket space when asked for it."""
    from doreisa_spark.operators import vectors as V

    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(4).collect()
    for r in rows:
        emb = r["embedding"]
        projs = V.lsh_projections_py(emb)
        base = V.lsh_bucket_py(emb)
        seq = V.lsh_probe_sequence_py(emb, n_probes=40)
        assert seq[0] == base and len(seq) == 41 == len(set(seq))
        margins = [abs(p) for p in projs]

        def score(bucket):
            flipped = bucket ^ base
            return sum(m for i, m in enumerate(margins) if flipped >> i & 1)

        scores = [score(b) for b in seq[1:]]
        assert scores == sorted(scores)
        # exhaustive: 2^planes - 1 perturbations cover every bucket
        full = V.lsh_probe_sequence_py(emb, n_probes=2**V.LSH_PLANES - 1)
        assert sorted(full) == list(range(2**V.LSH_PLANES))


def test_deep_multiprobe_store_paths_agree(spark, tmp_path):
    """n_probes: expr and BLAS scoring agree; n_probes=0 equals
    n_flip=0; n_flip and n_probes are mutually exclusive."""
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    store.process_batch(e, 0)
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < _N_QUERIES).collect()
    ]
    assert _rows(store.query_topk_vectors(queries, _TOP_K, n_probes=0)) == _rows(
        store.query_topk_vectors(queries, _TOP_K)
    )
    deep_expr = store.query_topk_vectors(queries, _TOP_K, n_probes=20)
    deep_blas = store.query_topk_vectors(
        queries, _TOP_K, n_probes=20, scoring="blas"
    )
    assert {(r["qid"], r["cid"], r["rk"]) for r in deep_expr.collect()} == {
        (r["qid"], r["cid"], r["rk"]) for r in deep_blas.collect()
    }
    with pytest.raises(ValueError, match="n_flip"):
        store.query_topk_vectors(queries, _TOP_K, n_flip=2, n_probes=4)


def test_blas_bucketing_matches_expr(spark, tmp_path):
    """bucketing='blas' (bulk-load GEMM signs) produces the identical
    (bucket, vec_id) assignment and identical query results as the
    oracle-exact JVM hyperplane expression, at the default and an
    extended plane count (no zero-margin projections on this corpus)."""
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for planes, tag in ((None, "d"), (12, "p12")):
        kw = {} if planes is None else {"planes": planes}
        s_expr = LSHVectorStore(spark, str(tmp_path / f"x{tag}"), **kw)
        s_blas = LSHVectorStore(spark, str(tmp_path / f"b{tag}"), **kw)
        s_expr.process_batch(e, 0)
        s_blas.process_batch(e, 0, bucketing="blas")
        a = sorted(
            (r["bucket"], r["vec_id"])
            for r in s_expr.members().select("bucket", "vec_id").collect()
        )
        b = sorted(
            (r["bucket"], r["vec_id"])
            for r in s_blas.members().select("bucket", "vec_id").collect()
        )
        assert a == b
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < _N_QUERIES).collect()
    ]
    assert _rows(s_expr.query_topk_vectors(queries, _TOP_K, n_probes=8)) == _rows(
        s_blas.query_topk_vectors(queries, _TOP_K, n_probes=8)
    )
    with pytest.raises(ValueError, match="bucketing"):
        s_blas.process_batch(e, 5, bucketing="nope")

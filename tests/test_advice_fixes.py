"""Regression tests for the round-3 ADVICE edge cases.

Each test pins one previously-latent bug:
- mm_audio_windows: ZeroDivisionError on an empty payload
- sample_upweight: sequence(0, -1) phantom copies for sub-1000 weights
- argmin/argmax: NaN chunks must win globally (numpy first-NaN contract),
  not sort last as Spark's default NaN ordering would have it
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from doreisa_spark.plans.chunked import ChunkedArray
from doreisa_spark.queries import multimodal, sampling


@pytest.fixture()
def tiny_docs_dir(tmp_path):
    """A documents.parquet with an empty-text doc alongside normal ones."""
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["", "a" * 100, "xy"]),
            "lang": pa.array(["en", "de", "fr"]),
            "source": pa.array(["web"] * 3),
            "n_chars": pa.array([0, 100, 2], type=pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_mm_audio_windows_empty_payload(spark, tiny_docs_dir):
    rows = {
        (r["doc_id"], r["win_no"]): r
        for r in multimodal.mm_audio_windows(spark, tiny_docs_dir).collect()
    }
    # empty payload: one floor window, zero bytes, NULL rms (oracle's
    # sqrt(NULL/0)) — previously a ZeroDivisionError in the Arrow batch
    empty = rows[(1, 0)]
    assert empty["win_bytes"] == 0
    assert empty["rms"] is None
    # 100-byte payload: (100-64)//32+1 = 2 windows, both full (32+64 <= 100)
    assert rows[(2, 0)]["win_bytes"] == 64
    assert rows[(2, 1)]["win_bytes"] == 64
    ones = np.full(64, ord("a"), dtype=np.int64)
    assert rows[(2, 0)]["rms"] == pytest.approx(float(np.sqrt((ones**2).sum() / 64)))
    # sub-window payload: single short window
    assert rows[(3, 0)]["win_bytes"] == 2
    assert len(rows) == 4


def test_sample_upweight_sub_1000_weight_drops_rows(spark, monkeypatch):
    """A sub-1000 weight means copies ∈ {0, 1}; docs with 0 copies must
    vanish, not explode into sequence(0,-1) = [0,-1] phantom rows."""
    monkeypatch.setattr(sampling, "_UPWEIGHT_PERMILLE", {"en": 400})
    monkeypatch.setattr(sampling, "_DEFAULT_UPWEIGHT", 400)
    out = sampling.sample_upweight(spark, "/root/testdata/sf0.001").collect()
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert out, "40% of docs should survive"
    assert all(r["copy_no"] == 0 for r in out)
    assert len({r["doc_id"] for r in out}) == len(out)  # one copy max
    assert len(out) < n_docs  # strictly a downsample at 400 permille


def test_argmin_argmax_nan_first_contract(spark):
    """NaN anywhere → argmin/argmax return the globally FIRST NaN in C
    order, exactly as numpy does on the dense array."""
    chunks = {
        (0, 0): np.array([[5.0, 2.0], [9.0, 1.0]]),
        (0, 1): np.array([[7.0, np.nan], [3.0, np.nan]]),
        (1, 0): np.array([[8.0, 8.0], [np.nan, 12.0]]),
        (1, 1): np.array([[6.0, 6.0], [6.0, 6.0]]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "agnan", chunks)
    dense = arr.to_numpy()
    lo = arr.argmin().collect()[0]
    hi = arr.argmax().collect()[0]
    assert tuple(lo["coords"]) == np.unravel_index(dense.argmin(), dense.shape)
    assert tuple(hi["coords"]) == np.unravel_index(dense.argmax(), dense.shape)
    assert np.isnan(lo["value"]) and np.isnan(hi["value"])


def test_argmin_argmax_nan_free_floats_unchanged(spark):
    chunks = {
        (0,): np.array([4.0, -1.0]),
        (1,): np.array([3.5, 7.0]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "agfl", chunks)
    dense = arr.to_numpy()
    lo = arr.argmin().collect()[0]
    hi = arr.argmax().collect()[0]
    assert tuple(lo["coords"]) == np.unravel_index(dense.argmin(), dense.shape)
    assert lo["value"] == dense.min()
    assert tuple(hi["coords"]) == np.unravel_index(dense.argmax(), dense.shape)
    assert hi["value"] == dense.max()


def test_float_reductions_propagate_nan(spark):
    """numpy contract: any NaN → sum/mean/std/min/max are NaN. The Arrow
    hop nulls NaN partials and JVM aggregates skip NULLs, so without the
    boolean marker a NaN chunk silently VANISHES from the result (worse
    than wrong: sum returns a plausible finite total)."""
    chunks = {
        (0,): np.array([1.0, np.nan]),
        (1,): np.array([5.0, 2.0]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "nanred", chunks)
    assert np.isnan(arr.sum().first()["total"])
    assert np.isnan(arr.mean().first()["mean_value"])
    assert np.isnan(arr.std().first()["std_value"])
    assert np.isnan(arr.min().first()["min_value"])
    assert np.isnan(arr.max().first()["max_value"])


def test_axis_reductions_propagate_nan_per_coordinate(spark):
    """Axis reductions are NaN only where numpy is: the NaN column goes
    NaN, clean columns keep their exact totals."""
    chunks = {
        (0, 0): np.array([[1.0, np.nan], [2.0, 3.0]]),
        (1, 0): np.array([[4.0, 5.0], [6.0, 7.0]]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "nanax", chunks)
    dense = arr.to_numpy()
    got = {tuple(r["coords"]): r["total"] for r in arr.axis_sum(axis=0).collect()}
    expect = dense.sum(axis=0)
    assert got[(0,)] == expect[0]
    assert np.isnan(got[(1,)]) and np.isnan(expect[1])
    got_min = {tuple(r["coords"]): r["value"] for r in arr.axis_min(axis=0).collect()}
    assert got_min[(0,)] == dense.min(axis=0)[0]
    assert np.isnan(got_min[(1,)])


def test_integer_reductions_unaffected_by_nan_marker(spark):
    chunks = {(0,): np.array([2, 3], dtype=np.int64), (1,): np.array([5, 7], dtype=np.int64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "intred", chunks)
    assert arr.sum().first()["total"] == 17
    assert arr.min().first()["min_value"] == 2
    assert arr.max().first()["max_value"] == 7


def test_tensordot_negative_axes(spark):
    rng = np.random.default_rng(20)
    a_chunks = {(i, j): rng.integers(0, 9, size=(3, 4)).astype("float64")
                for i in range(2) for j in range(2)}
    b_chunks = {(i, j): rng.integers(0, 9, size=(4, 2)).astype("float64")
                for i in range(2) for j in range(2)}
    a = ChunkedArray.from_numpy_chunks(spark, "nga", a_chunks)
    b = ChunkedArray.from_numpy_chunks(spark, "ngb", b_chunks)
    expect = np.tensordot(a.to_numpy(), b.to_numpy(), axes=((-1,), (0,)))
    out = a.tensordot(b, axes=((-1,), (0,)))
    assert np.allclose(out.to_numpy(), expect)


# ----------------------------------------------------------- round-5 ADVICE

SF_SMALL = "/root/testdata/sf0.001"


def test_ivf_blas_assignment_agrees_with_expr_path(spark):
    """The BLAS GEMM assignment (with near-tie sequential-fold rescore)
    must bit-agree with the oracle-exact expression assignment on every
    corpus vector — the gate ADVICE r5 asked for, so the exact-hash oracle
    on sim_ann_ivf_blas can't flip under a different BLAS."""
    from pyspark.sql import functions as F

    from doreisa_spark.catalog import table
    from doreisa_spark.queries import similarity as S

    e = table(spark, SF_SMALL, "embeddings")
    cent = e.where(
        (F.col("vec_id") >= S._IVF_CENT_LO)
        & (F.col("vec_id") < S._IVF_CENT_LO + S._IVF_CELLS)
    ).select(
        (F.col("vec_id") - S._IVF_CENT_LO).alias("cell"),
        F.col("embedding").alias("cemb"),
    )
    corpus = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    blas = {r["cid"]: r["cell"] for r in S._ivf_assign_blas(cent.collect(), corpus).collect()}
    expr = {r["cid"]: r["cell"] for r in S._ivf_assign_expr(cent, corpus).collect()}
    assert blas == expr


def test_ivf_blas_tie_rescore_matches_fold_order(spark):
    """Construct an exact two-cell tie: the rescore must pick the LOWEST
    cell (the expression path's ORDER BY cos DESC, cell)."""
    from doreisa_spark.queries.similarity import _ivf_assign_blas

    cent_rows = [
        {"cell": 1, "cemb": [1.0, 0.0, 0.0, 0.0]},  # duplicate direction,
        {"cell": 0, "cemb": [2.0, 0.0, 0.0, 0.0]},  # shuffled input order
    ]
    corpus = spark.createDataFrame(
        [(7, [3.0, 0.0, 0.0, 0.0])], "cid bigint, ce array<float>"
    )
    out = _ivf_assign_blas(cent_rows, corpus).collect()
    assert len(out) == 1 and out[0]["cell"] == 0


def test_catalog_tz_pin_warns_not_silent(spark):
    """catalog.table('events') may pin the session TZ to UTC (the NTZ
    reinterpretation needs it) but must WARN rather than silently clobber
    a deliberately different session TZ."""
    import warnings

    from doreisa_spark import catalog

    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.warns(UserWarning, match="timeZone"):
            df = catalog.table(spark, SF_SMALL, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert dict(df.dtypes)["ts"] == "timestamp"
        # already-UTC session: no warning, no-op
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            catalog.table(spark, SF_SMALL, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_take_distributed_plan_matches_closure_path(spark, monkeypatch):
    """Forcing the joined-plan gather (threshold 0) must reproduce the
    closure-path/numpy result exactly — dup indices, arbitrary order,
    negative indices, non-zero axis."""
    from doreisa_spark.plans import chunked as C

    rng = np.random.default_rng(55)
    chunks = {
        (i, j): rng.integers(0, 100, size=(3, 4)).astype("int64")
        for i in range(3)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "takedist", chunks)
    dense = arr.to_numpy()
    idx = [5, 0, 5, -1, 3, 2, 2, 7]
    monkeypatch.setattr(C, "_TAKE_DISTRIBUTE_AT", 0)
    got = arr.take(idx, axis=0).to_numpy()
    assert np.array_equal(got, np.take(dense, idx, axis=0))
    idx2 = [3, 3, -4, 1]
    got2 = arr.take(idx2, axis=1).to_numpy()
    assert np.array_equal(got2, np.take(dense, idx2, axis=1))


# ----------------------------------------------------------- round-6 ADVICE


def test_axis_std_ill_conditioned_never_nan(spark):
    """Catastrophic cancellation (|mean| >> std) must clamp to 0.0, never
    NaN: sumsq/n - mean^2 rounds negative for data = 1e8 + eps*randn."""
    rng = np.random.default_rng(7)
    base = 1e8 + rng.normal(scale=1e-4, size=(4, 4))
    chunks = {(i, 0): base[2 * i : 2 * i + 2] for i in range(2)}
    arr = ChunkedArray.from_numpy_chunks(spark, "illstd", chunks)
    vals = [r["value"] for r in arr.axis_std(axis=0).collect()]
    assert len(vals) == 4
    assert all(not np.isnan(v) for v in vals), vals
    assert all(v >= 0.0 for v in vals)
    # well-conditioned data still matches numpy closely
    good = rng.normal(size=(4, 4))
    gchunks = {(i, 0): good[2 * i : 2 * i + 2] for i in range(2)}
    garr = ChunkedArray.from_numpy_chunks(spark, "goodstd", gchunks)
    got = {tuple(r["coords"]): r["value"] for r in garr.axis_std(axis=0).collect()}
    expect = good.std(axis=0)
    for c in range(4):
        assert got[(c,)] == pytest.approx(expect[c], rel=1e-9)


def test_store_tmp_is_lazy(monkeypatch):
    """Importing the dedup module must not create a scratch dir; the first
    _fresh_store_dir call does (ADVICE r6: no import-time fs side effect)."""
    import os

    from doreisa_spark.queries import dedup as D

    monkeypatch.setattr(D, "_STORE_TMP", None)
    # no dir springs into existence from module state alone
    d = D._fresh_store_dir("lazytest")
    assert os.path.isdir(d)
    assert D._STORE_TMP is not None and d.startswith(D._STORE_TMP)


def test_percentile_collect_rank_widen_fallback(spark):
    """The widened re-collect guard (r7 ADVICE: rank-safe version). Only
    the UPPER edge widens — blo is bit-identical to the map-side
    np.histogram edge, so an upper straggler (counted into this bin, lost
    to a driver-side last-ulp bhi) is recovered, while a value just BELOW
    blo belongs to bin b-1 and must NOT slip in and shift local_rank."""
    chunks = {(0,): np.arange(10, dtype=np.float64), (1,): np.arange(10, 20, dtype=np.float64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "pctlwide", chunks)
    rows_fn = arr._rows_fn()
    # window that narrowly misses its true member 8.0 at the TOP (bhi one
    # ulp below), with 7.0 sitting just below blo. The rank-0 answer for
    # this bin's population is 8.0; the old both-edges widening would
    # have pulled in the bin-b-1 straggler 7.0 and returned it (shifted
    # rank). The upper-only widening recovers exactly 8.0.
    blo = float(np.nextafter(7.0, np.inf))
    bhi = float(np.nextafter(8.0, -np.inf))
    got = arr._collect_rank(blo, bhi, False, 0, rows_fn)
    assert got == 8.0
    # a window that is empty even after upper widening raises loudly
    # instead of returning a wrong-bin value
    lo2 = float(np.nextafter(7.0, np.inf))
    hi2 = 7.5
    with pytest.raises(RuntimeError, match="disagree"):
        arr._collect_rank(lo2, hi2, False, 0, rows_fn)


def test_boolean_select_all_false_gives_numpy_empty_semantics(spark):
    """a[all-False mask] is numpy's EMPTY array: size 0, sum 0.0 — it
    must compose with reductions, not raise and not crash obscurely
    (ADVICE r5 resolved toward numpy parity; gather ops like
    take/compress still reject empty inputs with their own errors)."""
    chunks = {(0,): np.arange(4, dtype=np.float64), (1,): np.arange(4, 8, dtype=np.float64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "bselempty", chunks)
    zero = ChunkedArray.from_numpy_chunks(
        spark, "bselzero", {(0,): np.zeros(4), (1,): np.zeros(4)}
    )
    empty = arr.boolean_select(zero)
    assert empty.meta.global_shape == (0,)
    assert empty.sum().first()["total"] == 0.0
    assert empty.to_numpy().size == 0


def test_nanmin_nanmax_numpy_contract(spark):
    """NaN-skipping extremes: skip NaN, all-NaN -> NaN, ints delegate."""
    chunks = {
        (0,): np.array([np.nan, 5.0, 2.0]),
        (1,): np.array([np.nan, np.nan, np.nan]),
        (2,): np.array([7.0, -1.0, np.nan]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "nanext", chunks)
    assert arr.nanmin().first()["min_value"] == -1.0
    assert arr.nanmax().first()["max_value"] == 7.0
    all_nan = ChunkedArray.from_numpy_chunks(
        spark, "nanall", {(0,): np.full(3, np.nan), (1,): np.full(2, np.nan)}
    )
    assert np.isnan(all_nan.nanmin().first()["min_value"])
    assert np.isnan(all_nan.nanmax().first()["max_value"])
    ints = ChunkedArray.from_numpy_chunks(
        spark, "nanint", {(0,): np.array([4, 9], dtype=np.int64)}
    )
    assert ints.nanmin().first()["min_value"] == 4
    assert ints.nanmax().first()["max_value"] == 9

"""Chunked-tensor layer tests — closed-form oracles in the style of the
reference's tests (reference: tests/test_doreisa.py:18-21 asserts
``array.sum().compute() == 10 * timestep`` on known grids).

Dtype preservation mirrors reference tests/test_dtype.py:17-39 (int8 in
→ int8 out); ragged tiling mirrors the dask list-of-lists ``chunks``
convention the reference accepts (head_node.py:53,157-162)."""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark.plans.chunked import (
    ChunkedArray,
    GridMeta,
    expected_sum_arithmetic,
    ramp_chunk,
)

META = GridMeta("a", (2, 2), (8, 8))


def _ramp(spark, timestep=0):
    return ChunkedArray.from_function(spark, META, ramp_chunk, timestep=timestep)


def test_global_sum_closed_form(spark):
    total = _ramp(spark).sum().collect()[0]["total"]
    assert total == expected_sum_arithmetic(META)


def test_virtual_fusion_single_stage(spark):
    # generate → scale → shift → sum stays ONE virtual pipeline: the plan
    # has exactly one Python stage and no chunk payload column at all
    arr = _ramp(spark).scale(3.0).shift(2.0)
    assert arr.is_virtual
    n = META.global_shape[0] * META.global_shape[1]
    got = arr.sum().collect()[0]["total"]
    assert got == 3.0 * expected_sum_arithmetic(META) + 2.0 * n
    # materialized copy produces the identical grid
    assert np.array_equal(arr.materialize().to_numpy(), arr.to_numpy())


def test_mean(spark):
    got = _ramp(spark).mean().collect()[0]["mean_value"]
    rows, cols = META.global_shape
    assert got == pytest.approx(expected_sum_arithmetic(META) / (rows * cols))


def test_scale_and_shift(spark):
    base = expected_sum_arithmetic(META)
    n = META.global_shape[0] * META.global_shape[1]
    got = _ramp(spark).scale(3.0).shift(2.0).sum().collect()[0]["total"]
    assert got == 3.0 * base + 2.0 * n


def test_zip_with_subtract(spark):
    # A1 = 2*ramp, A0 = ramp → (A1 - A0).sum() == ramp.sum()
    a0 = _ramp(spark, 0)
    a1 = _ramp(spark, 1).scale(2.0)
    got = a1.zip_with(a0, "-").sum().collect()[0]["total"]
    assert got == expected_sum_arithmetic(META)


def test_zip_with_grid_mismatch(spark):
    other = ChunkedArray.from_function(spark, GridMeta("b", (4, 1), (8, 8)), ramp_chunk)
    with pytest.raises(ValueError, match="grid mismatch"):
        _ramp(spark).zip_with(other, "-")


def test_axis_sum(spark):
    rows = {
        r["coords"][0]: r["total"] for r in _ramp(spark).axis_sum(axis=0).collect()
    }
    nrows, ncols = META.global_shape
    for c in range(ncols):
        assert rows[c] == sum(r + c for r in range(nrows))


def test_axis_sum_3d(spark):
    # 3-D grid, reduce the middle axis; oracle = numpy on the assembled array
    chunks = {
        (i, j, k): np.arange(24, dtype=np.float64).reshape(2, 3, 4) * (i + 2 * j + 4 * k + 1)
        for i in range(2)
        for j in range(2)
        for k in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "cube", chunks)
    expect = arr.to_numpy().sum(axis=1)
    got = np.zeros_like(expect)
    for row in arr.axis_sum(axis=1).collect():
        i, k = row["coords"]
        got[i, k] = row["total"]
    assert np.array_equal(got, expect)


def test_axis_sum_1d(spark):
    # reducing a 1-D array's only axis leaves no coordinates: one row,
    # empty coords, global total (regression: np.indices(()) crash)
    chunks = {
        (0,): np.array([1, 2, 3], dtype=np.int64),
        (1,): np.array([4, 5, 6], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "flat", chunks)
    rows = arr.axis_sum(axis=0).collect()
    assert len(rows) == 1
    assert list(rows[0]["coords"]) == []
    assert rows[0]["total"] == 21


def test_map_numpy_kernel(spark):
    got = _ramp(spark).map_numpy(lambda a: a * a).sum().collect()[0]["total"]
    nrows, ncols = META.global_shape
    expect = float(sum((r + c) ** 2 for r in range(nrows) for c in range(ncols)))
    assert got == expect


def test_from_numpy_chunks_roundtrip(spark):
    chunks = {
        (0, 0): np.ones((2, 2)),
        (0, 1): 2 * np.ones((2, 2)),
        (1, 0): 3 * np.ones((2, 2)),
        (1, 1): 4 * np.ones((2, 2)),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "rt", chunks)
    out = arr.to_numpy()
    assert out.shape == (4, 4)
    assert out[0, 0] == 1 and out[0, 3] == 2 and out[3, 0] == 3 and out[3, 3] == 4
    assert arr.count_chunks() == 4


# ------------------------------------------------------------- dtype parity
def test_int8_dtype_preserved(spark):
    # reference tests/test_dtype.py:17-39 pushes int8 chunks end to end
    chunks = {
        (0,): np.array([1, 2, 3], dtype=np.int8),
        (1,): np.array([4, 5, 6], dtype=np.int8),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "i8", chunks)
    assert arr.meta.dtype == "int8"
    out = arr.to_numpy()
    assert out.dtype == np.int8
    assert out.tolist() == [1, 2, 3, 4, 5, 6]
    total = arr.sum().collect()[0]["total"]
    assert isinstance(total, int) and total == 21


def test_int64_sum_exact_beyond_float53(spark):
    # 2^53 + 1 is not representable in float64; an exact BIGINT fold must
    # keep the +1 and +2
    big = 2**53
    chunks = {
        (0,): np.array([big, 1], dtype=np.int64),
        (1,): np.array([1, 0], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "i64", chunks)
    total = arr.sum().collect()[0]["total"]
    assert total == big + 2  # float64 would round this to 2**53


def test_scalar_op_promotes_like_numpy(spark):
    chunks = {(0,): np.array([1, 2], dtype=np.int32)}
    arr = ChunkedArray.from_numpy_chunks(spark, "p", chunks)
    assert arr.scale(2).meta.dtype == "int32"  # int * int stays int
    scaled = arr.scale(2.5)  # int * float → float64
    assert scaled.meta.dtype == "float64"
    assert scaled.to_numpy().tolist() == [2.5, 5.0]


def test_zip_with_divide_promotes_float(spark):
    chunks = {(0,): np.array([7, 8], dtype=np.int64)}
    a = ChunkedArray.from_numpy_chunks(spark, "d1", chunks)
    b = ChunkedArray.from_numpy_chunks(spark, "d2", {(0,): np.array([2, 2], dtype=np.int64)})
    out = a.zip_with(b, "/")
    assert out.meta.dtype == "float64"
    assert out.to_numpy().tolist() == [3.5, 4.0]


def test_uint8_roundtrip_and_exact_sum(spark):
    # uint8 volumes are the common HPC/multimodal payload (reference
    # accepts any numpy dtype, head_node.py:84). Values near the 255 cap
    # must survive the binary round-trip and sum exactly in int64.
    chunks = {
        (0,): np.array([250, 251, 252], dtype=np.uint8),
        (1,): np.array([253, 254, 255], dtype=np.uint8),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "u8", chunks)
    assert arr.meta.dtype == "uint8"
    out = arr.to_numpy()
    assert out.dtype == np.uint8
    assert out.tolist() == [250, 251, 252, 253, 254, 255]
    total = arr.sum().collect()[0]["total"]
    assert isinstance(total, int) and total == 1515


def test_uint32_sum_exact_beyond_float53(spark):
    # sums of large uint32 values must hit the exact BIGINT fold, not a
    # float64 path that would round away low bits
    big = np.uint32(2**32 - 1)
    chunks = {(0,): np.full(2**21, big, dtype=np.uint32)}
    arr = ChunkedArray.from_numpy_chunks(spark, "u32", chunks)
    total = arr.sum().collect()[0]["total"]
    assert total == (2**32 - 1) * 2**21  # > 2^53; exact only via int64


def test_unsupported_dtype_rejected(spark):
    # datetime64 has no analytics story here; float16 is redirected to
    # the ingest-upcast contract with its own message
    with pytest.raises(TypeError, match="unsupported chunk dtype"):
        ChunkedArray.from_numpy_chunks(
            spark, "u", {(0,): np.array([1, 2], dtype="datetime64[s]")}
        )
    from doreisa_spark.plans.chunked import GridMeta

    with pytest.raises(TypeError, match="float16 is ingest-only"):
        GridMeta("h", (1,), (4,), "float16")


def test_uint64_sum_exact_beyond_int64(spark):
    # reference parity: any numpy dtype (head_node.py:84). Two near-max
    # uint64 values sum past 2^64 — exact only via the DECIMAL(38,0) fold
    # (int64 overflows, float64 rounds, numpy itself would wrap mod 2^64)
    big = np.uint64(2**64 - 1)
    chunks = {
        (0,): np.array([big, 1], dtype=np.uint64),
        (1,): np.array([big, 0], dtype=np.uint64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "u64", chunks)
    assert arr.meta.dtype == "uint64"
    out = arr.to_numpy()
    assert out.dtype == np.uint64 and out.tolist() == [big, 1, big, 0]
    total = arr.sum().collect()[0]["total"]
    assert int(total) == 2 * (2**64 - 1) + 1  # > 2^64: true value, no wrap
    mean = arr.mean().collect()[0]["mean_value"]
    assert mean == pytest.approx((2 * (2**64 - 1) + 1) / 4)


def test_uint64_min_max_argmax_exact(spark):
    big = 2**64 - 1
    chunks = {
        (0,): np.array([5, big], dtype=np.uint64),
        (1,): np.array([7, 3], dtype=np.uint64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "u64x", chunks)
    assert int(arr.min().collect()[0]["min_value"]) == 3
    assert int(arr.max().collect()[0]["max_value"]) == big  # int64 can't hold this
    hi = arr.argmax().collect()[0]
    assert tuple(hi["coords"]) == (1,) and int(hi["value"]) == big
    lo = arr.argmin().collect()[0]
    assert tuple(lo["coords"]) == (3,) and int(lo["value"]) == 3


def test_uint64_axis_sum_exact(spark):
    big = np.uint64(2**63)  # two of these per column: sum = 2^64 > int64/uint64
    chunks = {
        (i, j): np.full((2, 2), big, dtype=np.uint64) for i in range(2) for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "u64ax", chunks)
    rows = arr.axis_sum(axis=0).collect()
    assert len(rows) == 4
    for r in rows:
        assert int(r["total"]) == 4 * 2**63  # 2^65: exact via DECIMAL
    mx = arr.axis_max(axis=1).collect()
    assert all(int(r["value"]) == 2**63 for r in mx)


def test_uint64_std_rejected_with_guidance(spark):
    chunks = {(0,): np.array([1, 2], dtype=np.uint64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "u64s", chunks)
    with pytest.raises(TypeError, match="astype"):
        arr.std()


# ------------------------------------------------------------ ragged tiling
def test_ragged_tiling_accepted(spark):
    # dask chunks=((4, 5),): ragged edge like a real MPI decomposition
    chunks = {(0,): np.arange(4, dtype=np.float64), (1,): np.arange(5, dtype=np.float64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "ragged", chunks)
    assert arr.meta.chunks == ((4, 5),)
    assert arr.meta.global_shape == (9,)
    assert arr.sum().collect()[0]["total"] == 6 + 10
    out = arr.to_numpy()
    assert out.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4]


def test_ragged_2d_sum_and_axis(spark):
    # 2×2 grid, row heights (2, 3), col widths (4, 1)
    heights, widths = (2, 3), (4, 1)
    rng = np.random.default_rng(7)
    chunks = {
        (i, j): rng.integers(0, 100, size=(heights[i], widths[j])).astype(np.float64)
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "r2", chunks)
    full = arr.to_numpy()
    assert full.shape == (5, 5)
    assert arr.sum().collect()[0]["total"] == full.sum()
    col_totals = {r["coords"][0]: r["total"] for r in arr.axis_sum(axis=0).collect()}
    for c in range(5):
        assert col_totals[c] == full[:, c].sum()


def test_inconsistent_ragged_sizes_rejected(spark):
    # (0,0) says row-block 0 has height 2; (0,1) says 3 → dask-invalid
    chunks = {
        (0, 0): np.ones((2, 4)),
        (0, 1): np.ones((3, 1)),
        (1, 0): np.ones((3, 4)),
        (1, 1): np.ones((3, 1)),
    }
    with pytest.raises(ValueError, match="conflicts"):
        ChunkedArray.from_numpy_chunks(spark, "bad", chunks)


def test_incomplete_grid_rejected(spark):
    chunks = {(0, 0): np.ones((2, 2)), (1, 1): np.ones((2, 2))}
    with pytest.raises(ValueError, match="incomplete grid"):
        ChunkedArray.from_numpy_chunks(spark, "holes", chunks)


def test_preprocess_at_generation(spark):
    # preprocess 10x at ingest (reference: tests/test_preprocessing_callback.py)
    arr = ChunkedArray.from_function(spark, META, ramp_chunk, preprocess=lambda a: 10 * a)
    assert arr.sum().collect()[0]["total"] == 10 * expected_sum_arithmetic(META)


def test_min_max_closed_form(spark):
    arr = _ramp(spark)
    assert arr.min().first()["min_value"] == 0.0
    rows, cols = arr.meta.global_shape
    assert arr.max().first()["max_value"] == float(rows + cols - 2)


def test_min_max_int_dtype(spark):
    chunks = {
        (0,): np.array([-7, 2], dtype=np.int32),
        (1,): np.array([5, 11], dtype=np.int32),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mm", chunks)
    lo, hi = arr.min().first()["min_value"], arr.max().first()["max_value"]
    assert isinstance(lo, int) and (lo, hi) == (-7, 11)


# ---------------------------------------------------------------- ufuncs
def test_ufunc_sqrt_of_square_recovers_ramp(spark):
    arr = _ramp(spark)
    got = arr.ufunc("square").ufunc("sqrt").sum().first()["total"]
    assert got == expected_sum_arithmetic(META)


def test_abs_negative_roundtrip(spark):
    chunks = {(0,): np.array([-3.0, 4.0, -5.0])}
    arr = ChunkedArray.from_numpy_chunks(spark, "ab", chunks)
    assert arr.ufunc("negative").abs().to_numpy().tolist() == [3.0, 4.0, 5.0]
    assert arr.abs().meta.dtype == "float64"


def test_clip_preserves_dtype(spark):
    chunks = {(0,): np.array([0, 100, 255], dtype=np.uint8)}
    arr = ChunkedArray.from_numpy_chunks(spark, "cl", chunks)
    out = arr.clip(10, 200)
    assert out.meta.dtype == "uint8"
    assert out.to_numpy().tolist() == [10, 100, 200]


def test_sqrt_uint8_widens_to_float64(spark):
    # numpy would give float16 (unsupported); the engine computes in f64
    chunks = {(0,): np.array([4, 9, 16], dtype=np.uint8)}
    arr = ChunkedArray.from_numpy_chunks(spark, "sq", chunks)
    out = arr.ufunc("sqrt")
    assert out.meta.dtype == "float64"
    assert out.to_numpy().tolist() == [2.0, 3.0, 4.0]


def test_astype_lazy_conversion(spark):
    chunks = {(0,): np.array([1.5, 2.5], dtype=np.float64)}
    arr = ChunkedArray.from_numpy_chunks(spark, "at", chunks)
    out = arr.astype("int32")
    assert out.meta.dtype == "int32"
    assert out.to_numpy().tolist() == [1, 2]
    assert out.sum().first()["total"] == 3


def test_unknown_ufunc_rejected(spark):
    with pytest.raises(ValueError, match="unsupported ufunc"):
        _ramp(spark).ufunc("tanh")


def test_maximum_minimum_elementwise(spark):
    chunks_a = {
        (0,): np.array([1, 9, 3], dtype=np.int32),
        (1,): np.array([7, 2, 8], dtype=np.int32),
    }
    chunks_b = {
        (0,): np.array([4, 5, 6], dtype=np.int32),
        (1,): np.array([1, 9, 9], dtype=np.int32),
    }
    a = ChunkedArray.from_numpy_chunks(spark, "ma", chunks_a)
    b = ChunkedArray.from_numpy_chunks(spark, "mb", chunks_b)
    assert a.maximum(b).sum().collect()[0]["total"] == 4 + 9 + 6 + 7 + 9 + 9
    assert a.minimum(b).sum().collect()[0]["total"] == 1 + 5 + 3 + 1 + 2 + 8
    assert a.maximum(b).meta.dtype == "int32"  # numpy promotion, no widening


def test_maximum_virtual_fuses(spark):
    # virtual-virtual maximum stays virtual: zero-shuffle fusion path
    a = _ramp(spark).scale(2)
    b = _ramp(spark).shift(100)
    fused = a.maximum(b)
    assert fused.is_virtual
    ref_a = np.concatenate(
        [np.concatenate([ramp_chunk((i, j), (8, 8)) * 2 for j in range(2)], axis=1) for i in range(2)],
        axis=0,
    )
    ref_b = np.concatenate(
        [np.concatenate([ramp_chunk((i, j), (8, 8)) + 100 for j in range(2)], axis=1) for i in range(2)],
        axis=0,
    )
    assert fused.sum().collect()[0]["total"] == np.maximum(ref_a, ref_b).sum()


def test_axis_min_max_mean_3d(spark):
    chunks = {
        (i, j, k): np.arange(24, dtype=np.int64).reshape(2, 3, 4) * (i + 2 * j + 4 * k + 1)
        - 10 * i
        for i in range(2)
        for j in range(2)
        for k in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mm3", chunks)
    dense = arr.to_numpy()
    for axis in range(3):
        for method, np_red in (
            ("axis_min", np.min),
            ("axis_max", np.max),
            ("axis_mean", np.mean),
        ):
            expect = np_red(dense, axis=axis)
            got = np.zeros_like(expect, dtype=np.float64)
            for row in getattr(arr, method)(axis).collect():
                got[tuple(row["coords"])] = row["value"]
            assert np.array_equal(got, expect.astype(np.float64)), (method, axis)


def test_axis_min_1d(spark):
    chunks = {
        (0,): np.array([5, 2, 9], dtype=np.int64),
        (1,): np.array([4, 8, 1], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mm1", chunks)
    rows = arr.axis_min(axis=0).collect()
    assert len(rows) == 1 and rows[0]["value"] == 1
    rows = arr.axis_max(axis=0).collect()
    assert len(rows) == 1 and rows[0]["value"] == 9


def test_axis_cumsum_1d_across_chunks(spark):
    chunks = {
        (0,): np.array([1, 2, 3], dtype=np.int32),
        (1,): np.array([4, 5, 6], dtype=np.int32),
        (2,): np.array([7, 8, 9], dtype=np.int32),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "cs1", chunks)
    out = arr.axis_cumsum(axis=0)
    assert out.meta.dtype == "int64"  # exact accumulator
    dense = out.to_numpy()
    assert np.array_equal(dense, np.concatenate([chunks[(i,)] for i in range(3)]).cumsum())


def test_axis_cumsum_3d_every_axis(spark):
    chunks = {
        (i, j, k): np.arange(24, dtype=np.float64).reshape(2, 3, 4) * (i + 2 * j + 4 * k + 1)
        for i in range(2)
        for j in range(2)
        for k in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "cs3", chunks)
    dense = arr.to_numpy()
    for axis in range(3):
        got = arr.axis_cumsum(axis).to_numpy()
        assert np.array_equal(got, dense.cumsum(axis=axis)), axis


def test_axis_cumsum_ragged(spark):
    chunks = {
        (0, 0): np.ones((2, 3), dtype=np.int64),
        (0, 1): 2 * np.ones((2, 2), dtype=np.int64),
        (1, 0): 3 * np.ones((1, 3), dtype=np.int64),
        (1, 1): 4 * np.ones((1, 2), dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "csr", chunks)
    dense = arr.to_numpy()
    for axis in range(2):
        got = arr.axis_cumsum(axis).to_numpy()
        assert np.array_equal(got, dense.cumsum(axis=axis)), axis


def test_axis_cumsum_composes_with_sum(spark):
    # result is a first-class ChunkedArray: reductions chain onto it
    chunks = {
        (0,): np.array([1, 2], dtype=np.int64),
        (1,): np.array([3, 4], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "csc", chunks)
    total = arr.axis_cumsum(0).sum().collect()[0]["total"]
    assert total == np.array([1, 2, 3, 4]).cumsum().sum()  # 1+3+6+10


def test_argmin_argmax(spark):
    chunks = {
        (0, 0): np.array([[5, 2], [9, 1]], dtype=np.int64),
        (0, 1): np.array([[7, 0], [3, 4]], dtype=np.int64),
        (1, 0): np.array([[8, 8], [8, 12]], dtype=np.int64),
        (1, 1): np.array([[6, 6], [6, 6]], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "ag", chunks)
    dense = arr.to_numpy()
    lo = arr.argmin().collect()[0]
    hi = arr.argmax().collect()[0]
    assert tuple(lo["coords"]) == np.unravel_index(dense.argmin(), dense.shape)
    assert lo["value"] == dense.min()
    assert tuple(hi["coords"]) == np.unravel_index(dense.argmax(), dense.shape)
    assert hi["value"] == dense.max()


def test_argmax_tie_takes_first_occurrence(spark):
    chunks = {
        (0,): np.array([1, 7, 3], dtype=np.int64),
        (1,): np.array([7, 2, 7], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "agt", chunks)
    row = arr.argmax().collect()[0]
    assert tuple(row["coords"]) == (1,) and row["value"] == 7


def test_where_ternary(spark):
    chunks_a = {(0,): np.array([1.0, 2.0, 3.0]), (1,): np.array([4.0, 5.0, 6.0])}
    chunks_c = {(0,): np.array([1.0, 0.0, 1.0]), (1,): np.array([0.0, 0.0, 1.0])}
    chunks_b = {(0,): np.array([-1.0, -2.0, -3.0]), (1,): np.array([-4.0, -5.0, -6.0])}
    a = ChunkedArray.from_numpy_chunks(spark, "wa", chunks_a)
    c = ChunkedArray.from_numpy_chunks(spark, "wc", chunks_c)
    b = ChunkedArray.from_numpy_chunks(spark, "wb", chunks_b)
    got = a.where(c, b).to_numpy()
    assert np.array_equal(got, np.array([1.0, -2.0, 3.0, -4.0, -5.0, 6.0]))


def test_where_nan_safe(spark):
    # unselected NaN lanes must not leak through (mask-multiply would)
    chunks_a = {(0,): np.array([np.nan, 2.0])}
    chunks_c = {(0,): np.array([0.0, 1.0])}
    chunks_b = {(0,): np.array([9.0, np.nan])}
    a = ChunkedArray.from_numpy_chunks(spark, "na", chunks_a)
    c = ChunkedArray.from_numpy_chunks(spark, "nc", chunks_c)
    b = ChunkedArray.from_numpy_chunks(spark, "nb", chunks_b)
    assert np.array_equal(a.where(c, b).to_numpy(), np.array([9.0, 2.0]))


def test_where_virtual_fuses(spark):
    a = _ramp(spark).scale(1.0)
    cond = _ramp(spark).shift(-15.0)  # nonzero except where r+c == 15
    b = _ramp(spark).scale(-1.0)
    fused = a.where(cond, b)
    assert fused.is_virtual
    ref = np.concatenate(
        [np.concatenate([ramp_chunk((i, j), (8, 8)) for j in range(2)], axis=1) for i in range(2)],
        axis=0,
    )
    expect = np.where(ref - 15.0 != 0, ref, -ref).sum()
    assert fused.sum().collect()[0]["total"] == expect


def test_axis_diff_1d_across_chunks(spark):
    chunks = {
        (0,): np.array([1, 4, 9], dtype=np.int64),
        (1,): np.array([16, 25, 36], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "df1", chunks)
    out = arr.axis_diff(axis=0)
    assert out.meta.global_shape == (5,)
    assert np.array_equal(out.to_numpy(), np.diff(np.array([1, 4, 9, 16, 25, 36])))


def test_axis_diff_2d_both_axes(spark):
    rng = np.arange(48, dtype=np.float64).reshape(6, 8) ** 2
    chunks = {
        (i, j): rng[i * 3 : (i + 1) * 3, j * 4 : (j + 1) * 4]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "df2", chunks)
    for axis in range(2):
        got = arr.axis_diff(axis).to_numpy()
        assert np.array_equal(got, np.diff(rng, axis=axis)), axis


def test_axis_diff_trailing_singleton_chunk(spark):
    chunks = {
        (0,): np.array([3, 1], dtype=np.int64),
        (1,): np.array([4], dtype=np.int64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "df3", chunks)
    out = arr.axis_diff(axis=0)
    assert out.meta.nb_chunks_per_dim == (1,)
    assert np.array_equal(out.to_numpy(), np.array([-2, 3]))


def test_axis_diff_composes(spark):
    # d/dr of (r+c)^2 is 2(r+c)+1: diff then sum has a closed form
    arr = _ramp(spark).ufunc("square").axis_diff(axis=0)
    total = arr.sum().collect()[0]["total"]
    expect = sum(2 * (r + c) + 1 for r in range(15) for c in range(16))
    assert total == expect


def test_scale_axis_matvec(spark):
    rng = np.arange(24, dtype=np.float64).reshape(4, 6) ** 2
    chunks = {
        (i, j): rng[i * 2 : (i + 1) * 2, j * 3 : (j + 1) * 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mv", chunks)
    v = np.array([2.0, -1.0, 0.5, 3.0, 1.0, -2.0])
    got = np.zeros(4)
    for row in arr.scale_axis(v, axis=1).axis_sum(axis=1).collect():
        got[row["coords"][0]] = row["total"]
    assert np.array_equal(got, rng @ v)


def test_scale_axis_rejects_bad_length(spark):
    arr = _ramp(spark)
    with pytest.raises(ValueError):
        arr.scale_axis(np.ones(3), axis=0)


def test_axis_argmin_argmax_matches_numpy(spark):
    chunks = {
        (i, j): np.array([[5.0, 2.0], [9.0, 2.0]]) * (i + 1) + j
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "axarg", chunks)
    dense = arr.to_numpy()
    for axis in (0, 1):
        lo = {tuple(r["coords"]): (r["index"], r["value"])
              for r in arr.axis_argmin(axis).collect()}
        hi = {tuple(r["coords"]): (r["index"], r["value"])
              for r in arr.axis_argmax(axis).collect()}
        amin, amax = dense.argmin(axis=axis), dense.argmax(axis=axis)
        vmin, vmax = dense.min(axis=axis), dense.max(axis=axis)
        for k, pos in np.ndenumerate(amin):
            assert lo[k] == (pos, vmin[k]), (axis, k)
        for k, pos in np.ndenumerate(amax):
            assert hi[k] == (pos, vmax[k]), (axis, k)


def test_axis_argmin_argmax_nan_contract(spark):
    chunks = {
        (0, 0): np.array([[1.0, np.nan], [2.0, 3.0]]),
        (1, 0): np.array([[np.nan, 5.0], [0.5, 7.0]]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "axargn", chunks)
    dense = arr.to_numpy()
    lo = {tuple(r["coords"]): (r["index"], r["value"])
          for r in arr.axis_argmin(0).collect()}
    hi = {tuple(r["coords"]): (r["index"], r["value"])
          for r in arr.axis_argmax(0).collect()}
    for c in range(2):
        exp_lo, exp_hi = dense.argmin(axis=0)[c], dense.argmax(axis=0)[c]
        assert lo[(c,)][0] == exp_lo and hi[(c,)][0] == exp_hi
        if np.isnan(dense[exp_lo, c]):
            assert np.isnan(lo[(c,)][1])
        else:
            assert lo[(c,)][1] == dense[exp_lo, c]


def test_axis_argmax_ties_first_occurrence(spark):
    chunks = {
        (0,  0): np.array([[4.0, 4.0]]),
        (1,  0): np.array([[4.0, 1.0]]),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "axargt", chunks)
    hi = {tuple(r["coords"]): r["index"] for r in arr.axis_argmax(0).collect()}
    assert hi[(0,)] == 0 and hi[(1,)] == 0  # first max wins, as numpy


# ------------------------------------------------- complex64/128 + float16


def test_complex_sum_mean_closed_form(spark):
    """Sum of a complex ramp (k + 2k·i for k in 0..N-1) across chunks:
    closed form N(N-1)/2 + N(N-1)·i, carried as paired doubles."""
    N = 4096
    ramp = np.arange(N, dtype=np.float64)
    z = (ramp + 2j * ramp).astype(np.complex128)
    chunks = {(i,): z[i * 1024 : (i + 1) * 1024] for i in range(4)}
    arr = ChunkedArray.from_numpy_chunks(spark, "cx", chunks)
    assert arr.meta.dtype == "complex128"
    row = arr.sum().first()
    expect = N * (N - 1) // 2
    assert row["total_re"] == float(expect)
    assert row["total_im"] == float(2 * expect)
    m = arr.mean().first()
    assert m["mean_re"] == pytest.approx(expect / N)
    assert m["mean_im"] == pytest.approx(2 * expect / N)


def test_complex64_elementwise_structural_matmul(spark):
    rng = np.random.default_rng(90)
    A = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype(
        np.complex64
    )
    B = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype(
        np.complex64
    )
    chunks_a = {(i, j): A[i * 3 : (i + 1) * 3, j * 3 : (j + 1) * 3] for i in range(2) for j in range(2)}
    chunks_b = {(i, j): B[i * 3 : (i + 1) * 3, j * 3 : (j + 1) * 3] for i in range(2) for j in range(2)}
    a = ChunkedArray.from_numpy_chunks(spark, "cxa", chunks_a)
    b = ChunkedArray.from_numpy_chunks(spark, "cxb", chunks_b)
    assert np.allclose((a.zip_with(b, "*")).to_numpy(), A * B)
    assert np.allclose(a.transpose((1, 0)).to_numpy(), A.T)
    got = a.matmul(b).to_numpy()
    assert got.dtype == np.complex64
    assert np.allclose(got, A @ B, atol=1e-5)
    # scalar promotion: complex scalar on a complex array stays complex
    assert np.allclose(a.scale(2 - 1j).to_numpy(), A * (2 - 1j))


def test_complex_nan_marker_survives_arrow(spark):
    z = np.array([1 + 1j, complex(np.nan, 2.0)], dtype=np.complex128)
    arr = ChunkedArray.from_numpy_chunks(spark, "cxnan", {(0,): z})
    row = arr.sum().first()
    assert np.isnan(row["total_re"])
    assert row["total_im"] == 3.0


def test_complex_ordering_reductions_rejected(spark):
    z = np.array([1 + 2j], dtype=np.complex128)
    arr = ChunkedArray.from_numpy_chunks(spark, "cxrej", {(0,): z})
    with pytest.raises(TypeError, match="complex arrays support sum"):
        arr.min()
    with pytest.raises(TypeError, match="unique.*unsupported for complex"):
        arr.unique()


def test_float16_upcasts_on_ingest(spark):
    h = np.arange(8, dtype=np.float16) / 4.0
    arr = ChunkedArray.from_numpy_chunks(
        spark, "f16", {(0,): h[:4], (1,): h[4:]}
    )
    assert arr.meta.dtype == "float32"
    out = arr.to_numpy()
    assert out.dtype == np.float32
    assert np.array_equal(out, h.astype(np.float32))  # exact widening
    assert arr.sum().first()["total"] == float(h.astype(np.float64).sum())


def test_float16_streaming_ingest_upcasts(spark):
    from doreisa_spark.streaming.simulation import Ingest

    ing = Ingest(spark)
    for p in range(2):
        ing.add_chunk(
            "half", (p,), (2,), 0, np.full(3, 1.5, dtype=np.float16)
        )
    name, ts, arr = ing.get_next_array()
    assert arr.meta.dtype == "float32"
    assert arr.sum().first()["total"] == 9.0


def test_nan_reductions_numpy_contract(spark):
    """nansum/nanmean skip NaN; all-NaN arrays give 0.0 / NaN (numpy);
    int arrays (no NaN possible) delegate to sum/mean."""
    import math

    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    a = np.array([1.0, np.nan, 3.0, np.nan])
    arr = ChunkedArray.from_numpy_chunks(spark, "nanr", {(0,): a[:2], (1,): a[2:]})
    assert arr.nansum().first()["total"] == 4.0
    assert arr.nanmean().first()["mean_value"] == 2.0
    # plain sum keeps the NaN-propagating contract
    assert math.isnan(arr.sum().first()["total"])

    allnan = ChunkedArray.from_numpy_chunks(
        spark, "nanall", {(0,): np.array([np.nan, np.nan])}
    )
    assert allnan.nansum().first()["total"] == 0.0
    assert math.isnan(allnan.nanmean().first()["mean_value"])

    ints = ChunkedArray.from_numpy_chunks(
        spark, "nanint", {(0,): np.array([1, 2, 3], dtype=np.int32)}
    )
    assert ints.nansum().first()["total"] == 6


def test_complex_nan_reductions(spark):
    """Complex nansum/nanmean skip elements with NaN in EITHER component
    (numpy isnan-on-complex contract), emitting paired columns."""
    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    a = np.array([1 + 2j, complex(np.nan, 1.0), 3 + 4j, complex(2.0, np.nan)],
                 dtype=np.complex128)
    arr = ChunkedArray.from_numpy_chunks(spark, "cnan", {(0,): a[:2], (1,): a[2:]})
    row = arr.nansum().first()
    assert (row["total_re"], row["total_im"]) == (4.0, 6.0)
    row = arr.nanmean().first()
    assert (row["mean_re"], row["mean_im"]) == (2.0, 3.0)


def test_percentile_matches_numpy(spark):
    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    rng = np.random.RandomState(11)
    full = rng.randn(30, 20) * 50
    chunks = {
        (i, j): full[i * 15 : (i + 1) * 15, j * 10 : (j + 1) * 10]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "pctt", chunks)
    for q in (0.0, 10.0, 50.0, 99.0, 100.0):
        assert abs(arr.percentile(q) - float(np.percentile(full, q))) < 1e-9
    # massive-tie case: refinement detects the degenerate bin
    const = ChunkedArray.from_numpy_chunks(spark, "pcttc", {(0,): np.full(50, 3.25)})
    assert const.percentile(40.0) == 3.25


def test_percentile_heavy_ties_with_spread(spark):
    """Regression: a huge tie mass plus spread values used to IndexError
    when refinement narrowed a non-last bin to zero width (the half-open
    collect selected nothing). Also exercises the shared-range
    percentiles() API."""
    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    rng = np.random.RandomState(2)
    full = np.concatenate([np.full(3000, 3.25), rng.uniform(0, 10, 800)])
    rng.shuffle(full)
    chunks = {(i,): full[i * 950 : (i + 1) * 950] for i in range(4)}
    arr = ChunkedArray.from_numpy_chunks(spark, "pcttie", chunks)
    arr._PCTL_COLLECT = 100  # force the refinement loop into the tie mass
    got = arr.percentiles([30.0, 50.0, 75.0, 99.0])
    expect = [float(np.percentile(full, q)) for q in (30.0, 50.0, 75.0, 99.0)]
    assert all(abs(g - e) < 1e-9 for g, e in zip(got, expect)), (got, expect)


def test_axis_std_matches_numpy(spark):
    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    rng = np.random.RandomState(9)
    full = rng.randn(8, 6) * 10
    chunks = {(i, j): full[i * 4 : (i + 1) * 4, j * 3 : (j + 1) * 3]
              for i in range(2) for j in range(2)}
    arr = ChunkedArray.from_numpy_chunks(spark, "axstd", chunks)
    for axis in (0, 1):
        rows = arr.axis_std(axis).collect()
        got = np.empty(full.shape[1 - axis])
        for r in rows:
            got[r["coords"][0]] = r["value"]
        assert np.allclose(got, full.std(axis=axis), rtol=1e-9)


def test_axis_cumprod_matches_numpy(spark):
    """da.cumprod parity: integer grids promote to int64 exactly as
    numpy's cumprod; multi-chunk axes combine via prefix products."""
    chunks = {
        (0,): np.array([1, 2, 3], dtype=np.int32),
        (1,): np.array([2, 1, 2], dtype=np.int32),
        (2,): np.array([3, 1, 1], dtype=np.int32),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "cp1", chunks)
    out = arr.axis_cumprod(axis=0)
    assert out.meta.dtype == "int64"
    dense = np.concatenate([chunks[(i,)] for i in range(3)])
    assert np.array_equal(out.to_numpy(), dense.cumprod())


def test_axis_cumprod_2d_both_axes_float(spark):
    rng = np.random.default_rng(61)
    dense = rng.uniform(0.5, 1.5, size=(6, 4))
    chunks = {
        (i, j): dense[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
        for i in range(3)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "cp2", chunks)
    for axis in range(2):
        got = arr.axis_cumprod(axis).to_numpy()
        # association differs from numpy's strict sequential order by one
        # chunk-prefix regrouping — equal to ~1 ulp
        assert np.allclose(got, dense.cumprod(axis=axis), rtol=1e-13)


def test_axis_nancumsum_nancumprod_match_numpy(spark):
    """NaN-skipping scans: NaN counts as 0 (+) / 1 (x), per numpy."""
    dense = np.array(
        [[1.0, np.nan], [2.0, 3.0], [np.nan, 4.0], [0.5, np.nan]]
    )
    chunks = {(i, 0): dense[2 * i : 2 * i + 2] for i in range(2)}
    arr = ChunkedArray.from_numpy_chunks(spark, "nanscan", chunks)
    got_s = arr.axis_nancumsum(axis=0).to_numpy()
    assert np.allclose(got_s, np.nancumsum(dense, axis=0), rtol=1e-13)
    assert not np.isnan(got_s).any()
    got_p = arr.axis_nancumprod(axis=0).to_numpy()
    assert np.allclose(got_p, np.nancumprod(dense, axis=0), rtol=1e-13)
    assert not np.isnan(got_p).any()

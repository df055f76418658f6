"""Structural chunk-grid operators — slice / stack / rechunk / matmul —
against numpy oracles (the dask.array surface beyond what the reference's
own tests exercise; dask ``array[...]``, ``stack``, ``rechunk``, ``@``)."""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark.plans.chunked import ChunkedArray, GridMeta, ramp_chunk


def _grid(spark, grid=(2, 2), chunk=(4, 4), dtype="float64", seed=0):
    rng = np.random.default_rng(seed)
    chunks = {
        (i, j): rng.integers(0, 50, size=chunk).astype(dtype)
        for i in range(grid[0])
        for j in range(grid[1])
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "g", chunks)
    return arr, arr.to_numpy()


# ------------------------------------------------------------------- slice
@pytest.mark.parametrize(
    "region",
    [
        ((2, 6), (1, 7)),  # crosses chunk borders both dims
        ((0, 8), (0, 8)),  # identity
        ((5, 6), (3, 4)),  # single element
        ((0, 4), (4, 8)),  # exactly one chunk
        ((None, 3), (5, None)),  # open ends
    ],
)
def test_slice_matches_numpy(spark, region):
    arr, full = _grid(spark)
    sl = arr.slice(region)
    a0, b0 = region[0][0] or 0, full.shape[0] if region[0][1] is None else region[0][1]
    a1, b1 = region[1][0] or 0, full.shape[1] if region[1][1] is None else region[1][1]
    assert np.array_equal(sl.to_numpy(), full[a0:b0, a1:b1])


def test_slice_prunes_chunks(spark):
    arr, _ = _grid(spark)
    sl = arr.slice(((0, 3), (0, 3)))  # only chunk (0,0) survives
    assert sl.count_chunks() == 1
    assert sl.meta.global_shape == (3, 3)


def test_slice_ragged(spark):
    heights, widths = (2, 3), (4, 1)
    rng = np.random.default_rng(3)
    chunks = {
        (i, j): rng.integers(0, 9, size=(heights[i], widths[j])).astype(np.int32)
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "rg", chunks)
    full = arr.to_numpy()
    sl = arr.slice(((1, 4), (2, 5)))
    out = sl.to_numpy()
    assert out.dtype == np.int32
    assert np.array_equal(out, full[1:4, 2:5])


def test_slice_1d_and_3d(spark):
    c1 = {(0,): np.arange(4.0), (1,): np.arange(4.0, 9.0)}
    a1 = ChunkedArray.from_numpy_chunks(spark, "s1", c1)
    assert a1.slice(((2, 7),)).to_numpy().tolist() == [2, 3, 4, 5, 6]
    c3 = {
        (i, j, k): np.arange(8.0).reshape(2, 2, 2) + 10 * (i + j + k)
        for i in range(2)
        for j in range(2)
        for k in range(2)
    }
    a3 = ChunkedArray.from_numpy_chunks(spark, "s3", c3)
    full = a3.to_numpy()
    assert np.array_equal(a3.slice(((1, 3), (0, 2), (2, 4))).to_numpy(), full[1:3, 0:2, 2:4])


def test_slice_empty_rejected(spark):
    arr, _ = _grid(spark)
    with pytest.raises(ValueError, match="empty or out-of-range"):
        arr.slice(((4, 4), (0, 8)))


# ------------------------------------------------------------------- stack
def test_stack_matches_numpy(spark):
    a, fa = _grid(spark, seed=1)
    b, fb = _grid(spark, seed=2)
    st = ChunkedArray.stack([a, b])
    assert st.meta.global_shape == (2,) + fa.shape
    assert np.array_equal(st.to_numpy(), np.stack([fa, fb]))
    # stacked arrays reduce like any other grid
    assert st.sum().collect()[0]["total"] == fa.sum() + fb.sum()


def test_stack_then_axis_sum(spark):
    a, fa = _grid(spark, seed=4)
    b, fb = _grid(spark, seed=5)
    st = ChunkedArray.stack([a, b])
    # reducing the stacked axis == elementwise sum of members
    got = np.zeros(fa.shape)
    for row in st.axis_sum(axis=0).collect():
        got[tuple(row["coords"])] = row["total"]
    assert np.array_equal(got, fa + fb)


def test_stack_mismatch_rejected(spark):
    a, _ = _grid(spark)
    c = ChunkedArray.from_numpy_chunks(spark, "c", {(0, 0): np.ones((3, 3))})
    with pytest.raises(ValueError, match="grid mismatch"):
        ChunkedArray.stack([a, c])


# ----------------------------------------------------------------- rechunk
@pytest.mark.parametrize(
    "spec",
    [
        (2, 2),  # finer
        (8, 8),  # single chunk
        (3, 5),  # misaligned with source tiling
        ((5, 3), (1, 7)),  # explicit ragged target
    ],
)
def test_rechunk_preserves_values(spark, spec):
    arr, full = _grid(spark)
    rc = arr.rechunk(spec)
    assert np.array_equal(rc.to_numpy(), full)
    assert rc.sum().collect()[0]["total"] == full.sum()


def test_rechunk_dtype_preserved(spark):
    chunks = {(0,): np.array([1, 2, 3, 4], dtype=np.int16), (1,): np.array([5, 6], dtype=np.int16)}
    arr = ChunkedArray.from_numpy_chunks(spark, "i", chunks)
    rc = arr.rechunk((3,))
    assert rc.meta.dtype == "int16"
    assert rc.to_numpy().tolist() == [1, 2, 3, 4, 5, 6]
    assert rc.meta.chunks == ((3, 3),)


def test_rechunk_shape_change_rejected(spark):
    arr, _ = _grid(spark)
    with pytest.raises(ValueError, match="changes global shape"):
        arr.rechunk(((4, 4), (4, 3)))


# ------------------------------------------------------------------ matmul
def test_matmul_matches_numpy(spark):
    rng = np.random.default_rng(11)
    a_chunks = {
        (i, k): rng.standard_normal((3, 4)) for i in range(2) for k in range(3)
    }
    b_chunks = {
        (k, j): rng.standard_normal((4, 5)) for k in range(3) for j in range(2)
    }
    A = ChunkedArray.from_numpy_chunks(spark, "A", a_chunks)
    B = ChunkedArray.from_numpy_chunks(spark, "B", b_chunks)
    C = A.matmul(B)
    assert C.meta.global_shape == (6, 10)
    assert np.allclose(C.to_numpy(), A.to_numpy() @ B.to_numpy())


def test_matmul_int_exact(spark):
    a = ChunkedArray.from_numpy_chunks(
        spark, "A", {(0, 0): np.arange(4, dtype=np.int64).reshape(2, 2)}
    )
    b = ChunkedArray.from_numpy_chunks(
        spark, "B", {(0, 0): np.arange(4, 8, dtype=np.int64).reshape(2, 2)}
    )
    C = a.matmul(b)
    assert C.meta.dtype == "int64"
    assert np.array_equal(C.to_numpy(), a.to_numpy() @ b.to_numpy())


def test_matmul_inner_mismatch_rejected(spark):
    a = ChunkedArray.from_numpy_chunks(spark, "A", {(0, 0): np.ones((2, 3))})
    b = ChunkedArray.from_numpy_chunks(spark, "B", {(0, 0): np.ones((4, 2))})
    with pytest.raises(ValueError, match="inner tiling mismatch"):
        a.matmul(b)


def test_matmul_ragged_inner(spark):
    # inner dim tiled (2, 3) on both sides
    rng = np.random.default_rng(21)
    widths = (2, 3)
    a_chunks = {(0, k): rng.standard_normal((3, widths[k])) for k in range(2)}
    b_chunks = {(k, 0): rng.standard_normal((widths[k], 4)) for k in range(2)}
    A = ChunkedArray.from_numpy_chunks(spark, "A", a_chunks)
    B = ChunkedArray.from_numpy_chunks(spark, "B", b_chunks)
    assert np.allclose(A.matmul(B).to_numpy(), A.to_numpy() @ B.to_numpy())


# --------------------------------------------------------------- transpose
def test_transpose_matches_numpy(spark):
    arr, full = _grid(spark, grid=(2, 3), chunk=(4, 5))
    t = arr.transpose()
    assert t.meta.global_shape == full.T.shape
    assert np.array_equal(t.to_numpy(), full.T)


def test_transpose_3d_axes(spark):
    rng = np.random.default_rng(7)
    chunks = {
        (i, j, k): rng.integers(0, 9, size=(2, 3, 4)).astype("float64")
        for i in range(2)
        for j in range(2)
        for k in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "t3", chunks)
    full = arr.to_numpy()
    perm = (2, 0, 1)
    t = arr.transpose(perm)
    assert np.array_equal(t.to_numpy(), full.transpose(perm))
    # sum is layout-invariant — catches pos/payload divergence cheaply
    assert t.sum().first()["total"] == full.sum()


def test_transpose_virtual_stays_virtual(spark):
    meta = GridMeta("v", (2, 2), (4, 4))
    arr = ChunkedArray.from_function(spark, meta, ramp_chunk)
    t = arr.transpose()
    assert t.is_virtual  # no materialization: still fused generation
    # ramp is symmetric in (r, c) so the transpose equals the original
    assert t.sum().first()["total"] == arr.sum().first()["total"]


def test_transpose_bad_axes_rejected(spark):
    arr, _ = _grid(spark)
    with pytest.raises(ValueError, match="permutation"):
        arr.transpose((0, 0))


def test_transpose_after_scale_composes(spark):
    arr, full = _grid(spark)
    out = arr.scale(3.0).transpose()
    assert np.array_equal(out.to_numpy(), (3.0 * full).T)


# ------------------------------------------------------------- concatenate
def test_concatenate_matches_numpy(spark):
    a, fa = _grid(spark, grid=(2, 2), chunk=(3, 4), seed=1)
    b, fb = _grid(spark, grid=(1, 2), chunk=(3, 4), seed=2)
    cat = ChunkedArray.concatenate([a, b], axis=0)
    assert np.array_equal(cat.to_numpy(), np.concatenate([fa, fb], axis=0))


def test_concatenate_axis1_ragged_on_axis(spark):
    # concat axis may be ragged ACROSS inputs: 2-wide + 3-wide columns
    a, fa = _grid(spark, grid=(2, 1), chunk=(4, 2), seed=3)
    b, fb = _grid(spark, grid=(2, 1), chunk=(4, 3), seed=4)
    cat = ChunkedArray.concatenate([a, b], axis=1)
    assert np.array_equal(cat.to_numpy(), np.concatenate([fa, fb], axis=1))


def test_concatenate_virtual_stays_virtual(spark):
    m1 = GridMeta("c1", (2, 2), (4, 4))
    m2 = GridMeta("c2", (1, 2), (4, 4))
    a = ChunkedArray.from_function(spark, m1, ramp_chunk)
    b = ChunkedArray.from_function(spark, m2, ramp_chunk)
    cat = ChunkedArray.concatenate([a, b], axis=0)
    assert cat.is_virtual
    assert cat.meta.global_shape == (12, 8)
    # closed form: rows 0..7 are the ramp; rows 8..11 repeat ramp rows 0..3
    full = np.add.outer(np.arange(8.0), np.arange(8.0))
    expect = np.concatenate([full, full[:4]], axis=0).sum()
    assert cat.sum().first()["total"] == expect


def test_concatenate_mismatch_rejected(spark):
    a, _ = _grid(spark, grid=(2, 2), chunk=(4, 4))
    b, _ = _grid(spark, grid=(2, 2), chunk=(4, 5))
    with pytest.raises(ValueError, match="tiling mismatch"):
        ChunkedArray.concatenate([a, b], axis=0)


# ---------------------------------------------------- ravel/reshape/mask/dot
def test_ravel_slab_tiled_zero_move(spark):
    # chunked along axis 0 only: each chunk is one contiguous C span
    a, full = _grid(spark, grid=(3, 1), chunk=(2, 6), seed=5)
    flat = a.ravel()
    assert flat.meta.global_shape == (36,)
    assert flat.meta.chunks == ((12, 12, 12),)
    assert np.array_equal(flat.to_numpy(), full.ravel())


def test_ravel_general_tiling(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=6)
    assert np.array_equal(a.ravel().to_numpy(), full.ravel())


@pytest.mark.parametrize(
    "grid,chunk,new_shape",
    [
        ((2, 2), (4, 4), (4, 16)),     # 8x8 -> 4x16
        ((2, 2), (4, 4), (16, 4)),     # 8x8 -> 16x4
        ((2, 2), (4, 4), (2, 2, 16)),  # rank change up
        ((3, 1), (2, 6), (9, 4)),      # slab source, aligned fast path
        ((2, 2), (4, 4), (64,)),       # to 1-D
    ],
)
def test_reshape_matches_numpy(spark, grid, chunk, new_shape):
    a, full = _grid(spark, grid=grid, chunk=chunk, seed=7)
    out = a.reshape(new_shape)
    assert out.meta.global_shape == tuple(new_shape)
    assert np.array_equal(out.to_numpy(), full.reshape(new_shape))


def test_reshape_bad_size_rejected(spark):
    a, _ = _grid(spark)
    with pytest.raises(ValueError, match="cannot reshape"):
        a.reshape((5, 5))


def test_boolean_select_matches_numpy(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=8)
    mask_chunks = {
        (i, j): (np.random.default_rng(10 + i * 2 + j).integers(0, 2, size=(4, 4)))
        .astype("float64")
        for i in range(2)
        for j in range(2)
    }
    cond = ChunkedArray.from_numpy_chunks(spark, "m", mask_chunks)
    dense_mask = cond.to_numpy() != 0
    sel = a.boolean_select(cond)
    assert sel.meta.ndim == 1
    assert np.array_equal(sel.to_numpy(), full[dense_mask])
    # masked reduction composes through the normal path
    assert sel.sum().first()["total"] == full[dense_mask].sum()


def test_boolean_select_empty_chunk(spark):
    a, full = _grid(spark, grid=(2, 1), chunk=(2, 3), seed=9)
    zeros = {p: np.zeros((2, 3)) for p in [(0, 0)]}
    ones = {p: np.ones((2, 3)) for p in [(1, 0)]}
    cond = ChunkedArray.from_numpy_chunks(spark, "m2", {**zeros, **ones})
    sel = a.boolean_select(cond)
    assert np.array_equal(sel.to_numpy(), full[2:].ravel())


@pytest.mark.parametrize(
    "shape_a,chunk_a,shape_b,chunk_b,axes",
    [
        ((2, 2), (3, 4), (2, 2), (4, 2), 1),          # plain matrix product
        ((2, 2, 1), (2, 3, 4), (2, 1, 2), (3, 4, 5), 2),  # contract 2 axes
        ((2, 2), (3, 4), (2, 2), (3, 5), ((0,), (0,))),   # contract dim0 vs dim0
    ],
)
def test_tensordot_matches_numpy(spark, shape_a, chunk_a, shape_b, chunk_b, axes):
    rng = np.random.default_rng(11)
    a_chunks = {
        p: rng.integers(0, 9, size=chunk_a).astype("float64")
        for p in np.ndindex(*shape_a)
    }
    b_chunks = {
        p: rng.integers(0, 9, size=chunk_b).astype("float64")
        for p in np.ndindex(*shape_b)
    }
    a = ChunkedArray.from_numpy_chunks(spark, "ta", a_chunks)
    b = ChunkedArray.from_numpy_chunks(spark, "tb", b_chunks)
    expect = np.tensordot(a.to_numpy(), b.to_numpy(), axes=axes)
    out = a.tensordot(b, axes=axes)
    assert out.meta.global_shape == expect.shape
    assert np.allclose(out.to_numpy(), expect)


def test_tensordot_full_contraction(spark):
    a, fa = _grid(spark, grid=(2, 2), chunk=(3, 3), seed=12)
    b, fb = _grid(spark, grid=(2, 2), chunk=(3, 3), seed=13)
    out = a.tensordot(b, axes=((0, 1), (0, 1)))
    assert out.meta.global_shape == (1,)
    assert out.to_numpy()[0] == np.tensordot(fa, fb, axes=((0, 1), (0, 1)))


@pytest.mark.parametrize("axis", [0, 1])
def test_take_matches_numpy(spark, axis):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=14)
    idx = [7, 0, 3, 3, 5, 1, 6, 2, 2]  # reorder + duplicates
    out = a.take(idx, axis=axis)
    assert np.array_equal(out.to_numpy(), np.take(full, idx, axis=axis))


def test_take_single_index_and_bounds(spark):
    a, full = _grid(spark, grid=(2, 1), chunk=(3, 5), seed=15)
    out = a.take([4], axis=0)
    assert np.array_equal(out.to_numpy(), full[[4]])
    with pytest.raises(IndexError):
        a.take([6], axis=0)


def test_take_composes_with_reductions(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=16)
    idx = [1, 1, 6]
    total = a.take(idx, axis=0).sum().first()["total"]
    assert total == np.take(full, idx, axis=0).sum()


def test_tensordot_outer_product_axes0(spark):
    # axes=0 is the outer product — zero contracted axes, k=1
    a_chunks = {(0,): np.array([1.0, 2.0, 3.0]), (1,): np.array([4.0, 5.0])}
    b_chunks = {(0,): np.array([10.0, 20.0])}
    a = ChunkedArray.from_numpy_chunks(spark, "oa", a_chunks)
    b = ChunkedArray.from_numpy_chunks(spark, "ob", b_chunks)
    expect = np.tensordot(a.to_numpy(), b.to_numpy(), axes=0)
    out = a.tensordot(b, axes=0)
    assert out.meta.global_shape == expect.shape
    assert np.array_equal(out.to_numpy(), expect)


def test_take_negative_indices_and_axis(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=21)
    out = a.take([-1, 0, -8], axis=0)
    assert np.array_equal(out.to_numpy(), np.take(full, [-1, 0, -8], axis=0))
    out2 = a.take([2, -3], axis=-1)
    assert np.array_equal(out2.to_numpy(), np.take(full, [2, -3], axis=-1))


def test_compress_matches_numpy(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=22)
    mask = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=bool)
    out = a.compress(mask, axis=0)
    assert np.array_equal(out.to_numpy(), np.compress(mask, full, axis=0))
    out1 = a.compress(mask, axis=1)
    assert np.array_equal(out1.to_numpy(), np.compress(mask, full, axis=1))


def test_topk_matches_numpy(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=23)
    got = [r["value"] for r in a.topk(5).collect()]
    assert got == sorted(full.ravel().tolist(), reverse=True)[:5]
    got_small = [r["value"] for r in a.topk(3, largest=False).collect()]
    assert got_small == sorted(full.ravel().tolist())[:3]


def test_topk_k_larger_than_chunk(spark):
    chunks = {(0,): np.array([3.0, 1.0]), (1,): np.array([9.0, 7.0])}
    a = ChunkedArray.from_numpy_chunks(spark, "tk", chunks)
    got = [r["value"] for r in a.topk(4).collect()]
    assert got == [9.0, 7.0, 3.0, 1.0]


def test_histogram_matches_numpy(spark):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=24)
    got = {r["bin"]: r["count"] for r in a.histogram(5, (0.0, 50.0)).collect()}
    expect, _ = np.histogram(full, bins=5, range=(0.0, 50.0))
    assert got == {i: int(c) for i, c in enumerate(expect)}


def test_histogram_empty_bins_present(spark):
    chunks = {(0,): np.array([1.0, 1.5]), (1,): np.array([9.0, 9.5])}
    a = ChunkedArray.from_numpy_chunks(spark, "hg", chunks)
    rows = {r["bin"]: (r["lo"], r["hi"], r["count"]) for r in a.histogram(5, (0.0, 10.0)).collect()}
    assert rows[0] == (0.0, 2.0, 2) and rows[4] == (8.0, 10.0, 2)
    assert rows[1][2] == 0 and rows[2][2] == 0 and rows[3][2] == 0


@pytest.mark.parametrize("axis", [0, 1, -1])
def test_flip_matches_numpy(spark, axis):
    a, full = _grid(spark, grid=(2, 3), chunk=(4, 2), seed=25)
    out = a.flip(axis=axis)
    assert np.array_equal(out.to_numpy(), np.flip(full, axis=axis))


def test_flip_ragged_tiling(spark):
    chunks = {(0,): np.arange(4, dtype=np.float64), (1,): np.arange(5, dtype=np.float64)}
    a = ChunkedArray.from_numpy_chunks(spark, "flr", chunks)
    assert np.array_equal(a.flip(0).to_numpy(), np.flip(a.to_numpy()))


@pytest.mark.parametrize("shift,axis", [(3, 0), (-2, 0), (5, 1), (0, 0), (16, 1)])
def test_roll_matches_numpy(spark, shift, axis):
    a, full = _grid(spark, grid=(2, 2), chunk=(4, 4), seed=26)
    out = a.roll(shift, axis=axis)
    assert np.array_equal(out.to_numpy(), np.roll(full, shift, axis=axis))


def test_topk_nan_contract(spark):
    """numpy treats NaN as the largest value: it leads largest-k and only
    backfills smallest-k — and must not silently vanish on the Arrow hop."""
    chunks = {(0,): np.array([np.nan, 100.0, 99.0]), (1,): np.array([1.0, 2.0, 3.0])}
    a = ChunkedArray.from_numpy_chunks(spark, "tknan", chunks)
    top = [r["value"] for r in a.topk(2).collect()]
    assert np.isnan(top[0]) and top[1] == 100.0
    small = [r["value"] for r in a.topk(3, largest=False).collect()]
    assert small == [1.0, 2.0, 3.0]  # NaN exceeds every finite value
    small_all = [r["value"] for r in a.topk(6, largest=False).collect()]
    assert small_all[:5] == [1.0, 2.0, 3.0, 99.0, 100.0] and np.isnan(small_all[5])


def test_flip_stays_virtual(spark):
    meta = GridMeta("fv", (3, 1), (2, 4))
    a = ChunkedArray.from_function(spark, meta, ramp_chunk)
    flipped = a.flip(0)
    assert flipped.is_virtual  # composed into the generation closure
    dense = a.to_numpy()
    assert np.array_equal(flipped.to_numpy(), np.flip(dense, axis=0))
    assert flipped.sum().first()["total"] == dense.sum()


def test_compress_all_false_clear_error(spark):
    a, _ = _grid(spark, grid=(2, 1), chunk=(2, 3), seed=27)
    with pytest.raises(ValueError, match="all False"):
        a.compress(np.zeros(4, dtype=bool), axis=0)


# ----------------------------------------------------------------- einsum


def _chunked(spark, name, dense, tile):
    """Chunk a dense array into `tile`-sized blocks."""
    nd = dense.ndim
    grids = [range((dense.shape[d] + tile[d] - 1) // tile[d]) for d in range(nd)]
    from itertools import product as _prod

    chunks = {}
    for pos in _prod(*grids):
        sl = tuple(
            slice(p * tile[d], min((p + 1) * tile[d], dense.shape[d]))
            for d, p in enumerate(pos)
        )
        chunks[pos] = np.ascontiguousarray(dense[sl])
    return ChunkedArray.from_numpy_chunks(spark, name, chunks)


@pytest.mark.parametrize(
    "spec",
    [
        "ij,jk->ik",          # matmul
        "ij,kj->ik",          # matmul with transposed B
        "ij,ij->",            # Frobenius inner product
        "i,j->ij",            # outer product
        "ij,jk->ki",          # matmul + output transpose
        "ij,j->i",            # mat-vec
    ],
)
def test_einsum_two_operand_matches_numpy(spark, spec):
    rng = np.random.default_rng(77)
    ext = {"i": 5, "j": 6, "k": 4}
    ta, tb = spec.split("->")[0].split(",")
    A = rng.integers(0, 9, size=tuple(ext[c] for c in ta)).astype("float64")
    B = rng.integers(0, 9, size=tuple(ext[c] for c in tb)).astype("float64")
    a = _chunked(spark, f"ea{spec.translate(str.maketrans('', '', ',->'))}", A, (3,) * A.ndim)
    b = _chunked(spark, f"eb{spec.translate(str.maketrans('', '', ',->'))}", B, (3,) * B.ndim)
    got = a.einsum(spec, b).to_numpy()
    expect = np.einsum(spec, A, B)
    if expect.ndim == 0:
        expect = expect.reshape(1)  # engine returns 1-element arrays for scalars
    assert np.allclose(got, expect)


@pytest.mark.parametrize("spec", ["ij->ji", "ij->j", "ij->", "ijk->ki"])
def test_einsum_single_operand_matches_numpy(spark, spec):
    rng = np.random.default_rng(78)
    t = spec.split("->")[0]
    ext = {"i": 5, "j": 6, "k": 4}
    A = rng.integers(0, 9, size=tuple(ext[c] for c in t)).astype("float64")
    a = _chunked(spark, f"es{t}{spec.split('->')[1]}", A, (3,) * A.ndim)
    got = a.einsum(spec).to_numpy()
    expect = np.einsum(spec, A)
    if expect.ndim == 0:
        expect = expect.reshape(1)
    assert np.allclose(got, expect)


def test_einsum_implicit_output(spark):
    rng = np.random.default_rng(79)
    A = rng.integers(0, 9, size=(4, 3)).astype("float64")
    B = rng.integers(0, 9, size=(3, 5)).astype("float64")
    a = _chunked(spark, "eimpa", A, (2, 2))
    b = _chunked(spark, "eimpb", B, (2, 2))
    # 'ij,jk' → implicit output 'ik' (alphabetical once-letters)
    assert np.allclose(a.einsum("ij,jk", b).to_numpy(), A @ B)


def test_einsum_reduced_letter_sums_out(spark):
    rng = np.random.default_rng(80)
    A = rng.integers(0, 9, size=(4, 3)).astype("float64")
    B = rng.integers(0, 9, size=(5, 3)).astype("float64")
    a = _chunked(spark, "erla", A, (2, 2))
    b = _chunked(spark, "erlb", B, (2, 2))
    # 'i' only in A and absent from output → A sums over axis 0 first
    got = a.einsum("ij,kj->k", b).to_numpy()
    assert np.allclose(got, np.einsum("ij,kj->k", A, B))


def test_einsum_rejects_diagonal_and_batch(spark):
    A = np.ones((3, 3))
    a = _chunked(spark, "ereja", A, (2, 2))
    with pytest.raises(NotImplementedError, match="repeated index"):
        a.einsum("ii->i")
    b = _chunked(spark, "erejb", np.ones((3, 3)), (2, 2))
    with pytest.raises(NotImplementedError, match="batch"):
        a.einsum("ij,ij->ij", b)
    with pytest.raises(ValueError, match="extents"):
        _chunked(spark, "erejc", np.ones((3, 4)), (2, 2)).einsum("ij,jk->ik", b)


# ------------------------------------------- pad / sort / diagonal / etc.


def test_pad_matches_numpy(spark):
    rng = np.random.default_rng(81)
    A = rng.integers(0, 9, size=(6, 7)).astype("float64")
    a = _chunked(spark, "padA", A, (3, 4))
    for pw in [1, (2, 0), ((1, 2), (3, 4)), ((0, 0), (0, 5))]:
        got = a.pad(pw, constant_value=9.5).to_numpy()
        assert np.array_equal(got, np.pad(A, pw, mode="constant", constant_values=9.5))


def test_pad_1d_and_composes(spark):
    A = np.arange(5, dtype=np.float64)
    a = _chunked(spark, "pad1", A, (2,))
    got = a.pad((3, 1), constant_value=-1.0)
    assert np.array_equal(got.to_numpy(), np.pad(A, (3, 1), constant_values=-1.0))
    # pad is lazy/fused: a downstream reduction still agrees
    assert got.sum().first()["total"] == A.sum() - 4.0


def test_sort_axis_matches_numpy(spark):
    rng = np.random.default_rng(82)
    A = rng.permutation(48).reshape(6, 8).astype("float64")
    a = _chunked(spark, "sortA", A, (3, 3))
    for ax in (0, 1, -1):
        assert np.array_equal(a.sort(axis=ax).to_numpy(), np.sort(A, axis=ax))


def test_diagonal_matches_numpy(spark):
    rng = np.random.default_rng(83)
    A = rng.integers(0, 99, size=(7, 9)).astype("int64")
    a = _chunked(spark, "diagA", A, (3, 4))
    for off in (0, 2, -3):
        assert np.array_equal(a.diagonal(off).to_numpy(), np.diagonal(A, off))
    with pytest.raises(ValueError, match="empty diagonal"):
        a.diagonal(9)


def test_broadcast_to_matches_numpy(spark):
    v = np.arange(1, 9, dtype=np.float64)
    a = _chunked(spark, "bcv", v, (3,))
    got = a.broadcast_to((5, 8), chunks=(2,))
    assert got.meta.nb_chunks_per_dim == (3, 3)
    assert np.array_equal(got.to_numpy(), np.broadcast_to(v, (5, 8)))
    # size-1 dim broadcast
    col = np.arange(4, dtype=np.float64).reshape(4, 1)
    b = _chunked(spark, "bcc", col, (2, 1))
    got2 = b.broadcast_to((4, 6), chunks=(3,))
    assert np.array_equal(got2.to_numpy(), np.broadcast_to(col, (4, 6)))
    with pytest.raises(ValueError, match="does not broadcast"):
        b.broadcast_to((5, 6))


def test_broadcast_to_feeds_binary_op(spark):
    """Broadcast with tiling pinned to another array's grid, then an
    elementwise op — the materializing-broadcast use case."""
    rng = np.random.default_rng(84)
    v = np.arange(1, 7, dtype=np.float64)
    M = rng.integers(0, 9, size=(4, 6)).astype("float64")
    av = _chunked(spark, "bfv", v, (3,))
    am = _chunked(spark, "bfm", M, (2, 3))
    prod = av.broadcast_to((4, 6), chunks=(2,)).zip_with(am, "*")
    assert np.allclose(prod.to_numpy(), v[None, :] * M)


def test_unique_counts(spark):
    A = np.array([[3, 1, 3], [1, 3, 7]], dtype=np.int64)
    a = _chunked(spark, "uqA", A, (1, 2))
    got = {r["value"]: r["n_occurrences"] for r in a.unique().collect()}
    assert got == {1: 2, 3: 3, 7: 1}
    B = np.array([0.5, 0.5, 2.5], dtype=np.float64)
    b = _chunked(spark, "uqB", B, (2,))
    gotb = {r["value"]: r["n_occurrences"] for r in b.unique().collect()}
    assert gotb == {0.5: 2, 2.5: 1}


def test_coarsen_matches_numpy(spark):
    """coarsen ≡ dask/numpy block-reduce for mean (promoting) and max
    (dtype-preserving), including ragged tilings whose every chunk size
    is divisible by the factor."""
    import numpy as np

    from doreisa_spark.plans.chunked import ChunkedArray

    rng = np.random.RandomState(7)
    full = rng.randint(0, 100, size=(12, 8)).astype(np.int32)
    chunks = {
        (0, 0): full[:4, :4], (0, 1): full[:4, 4:],
        (1, 0): full[4:12, :4], (1, 1): full[4:12, 4:],
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "coars", chunks)
    got_mean = arr.coarsen("mean", {0: 2, 1: 2}).to_numpy()
    expect_mean = full.reshape(6, 2, 4, 2).mean(axis=(1, 3))
    assert got_mean.dtype == np.float64
    assert np.array_equal(got_mean, expect_mean)

    got_max = arr.coarsen("max", {0: 4}).to_numpy()
    expect_max = full.reshape(3, 4, 8).max(axis=1)
    assert got_max.dtype == np.int32
    assert np.array_equal(got_max, expect_max)


def test_coarsen_rejects_non_divisible(spark):
    import numpy as np
    import pytest

    from doreisa_spark.plans.chunked import ChunkedArray

    arr = ChunkedArray.from_numpy_chunks(
        spark, "coarsbad", {(0,): np.arange(6.0), (1,): np.arange(6.0)}
    )
    with pytest.raises(ValueError, match="not divisible"):
        arr.coarsen("mean", {0: 4})


def test_map_overlap_matches_numpy_padding(spark):
    """map_overlap ≡ fn(np.pad(full)) trimmed, for every boundary mode,
    multi-chunk axes, and depth 2."""
    import numpy as np
    import pytest

    from doreisa_spark.plans.chunked import ChunkedArray

    rng = np.random.RandomState(5)
    full = rng.randint(0, 50, (12, 6)).astype(np.float64)
    chunks = {
        (i, j): full[i * 4 : (i + 1) * 4, j * 3 : (j + 1) * 3]
        for i in range(3)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "movl", chunks)

    def sum3(a):
        out = a.copy()
        out[1:-1] = a[:-2] + a[1:-1] + a[2:]
        return out

    for mode, np_mode in (("nearest", "edge"), ("constant", "constant"),
                          ("reflect", "symmetric")):  # dask reflect includes the edge
        got = arr.map_overlap(sum3, depth=1, axis=0, boundary=mode).to_numpy()
        p = np.pad(full, ((1, 1), (0, 0)), mode=np_mode)
        assert np.array_equal(got, p[:-2] + p[1:-1] + p[2:]), mode

    def sum5(a):
        out = a.copy()
        out[:, 2:-2] = (
            a[:, :-4] + a[:, 1:-3] + a[:, 2:-2] + a[:, 3:-1] + a[:, 4:]
        )
        return out

    got = arr.map_overlap(sum5, depth=2, axis=1, boundary="reflect").to_numpy()
    p = np.pad(full, ((0, 0), (2, 2)), mode="symmetric")
    assert np.array_equal(
        got, p[:, :-4] + p[:, 1:-3] + p[:, 2:-2] + p[:, 3:-1] + p[:, 4:]
    )

    with pytest.raises(ValueError, match="exceeds the smallest"):
        arr.map_overlap(sum3, depth=4, axis=1)

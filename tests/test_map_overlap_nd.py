"""N-dimensional map_overlap (r6 verdict ask #3): per-axis depth dicts,
corner-correct halo composition, dask/numpy-parity semantics.

Ground truth for every case: pad the DENSE global array by each axis's
depth with the numpy mode, apply the same kernel, trim — the dask
``map_overlap`` definition. Any shift-invariant kernel whose radius is
≤ depth per axis must agree chunk-wise with that global computation;
corners are the part a naive axis-independent exchange gets wrong, so
the kernels below deliberately read diagonal neighbors."""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark.plans.chunked import ChunkedArray

_NP_MODE = {"nearest": "edge", "reflect": "symmetric", "constant": "constant"}


def _global_reference(dense, fn, depths, boundary):
    widths = [(depths.get(d, 0), depths.get(d, 0)) for d in range(dense.ndim)]
    padded = np.pad(dense, widths, mode=_NP_MODE[boundary])
    res = fn(padded)
    sl = tuple(
        slice(depths.get(d, 0), depths.get(d, 0) + dense.shape[d])
        for d in range(dense.ndim)
    )
    return res[sl]


# Kernels are built by factories returning NESTED functions: cloudpickle
# serializes nested functions by value, while a module-level function in a
# test module pickles by REFERENCE and the executor worker dies with
# ModuleNotFoundError('test_map_overlap_nd').


def _make_five_point():
    def five_point(a):
        """5-point Laplacian-style sum — radius-1 in both axes."""
        out = a.copy()
        out[1:-1, 1:-1] = (
            a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:] + a[1:-1, 1:-1]
        )
        return out

    return five_point


def _make_diag():
    def diag(a):
        """Pure diagonal read — fails unless CORNER halos arrived."""
        out = a.copy()
        out[1:-1, 1:-1] = a[:-2, :-2] + a[2:, 2:]
        return out

    return diag


_five_point = _make_five_point()
_diag = _make_diag()


@pytest.mark.parametrize("boundary", ["nearest", "reflect", "constant"])
def test_2d_five_point_matches_global_pad(spark, boundary):
    rng = np.random.default_rng(3)
    dense = rng.integers(0, 50, size=(12, 10)).astype(np.float64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 5 * j : 5 * j + 5]
        for i in range(3)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, f"mo2d_{boundary}", chunks)
    got = arr.map_overlap(_five_point, depth={0: 1, 1: 1}, boundary=boundary)
    expect = _global_reference(dense, _five_point, {0: 1, 1: 1}, boundary)
    assert np.array_equal(got.to_numpy(), expect)


def test_2d_diagonal_corners_travel(spark):
    """The diagonal kernel reads ONLY corner neighbors: wrong unless the
    axis-composed exchange delivered transitive corner halos."""
    rng = np.random.default_rng(11)
    dense = rng.integers(0, 9, size=(8, 8)).astype(np.int64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 4 * j : 4 * j + 4]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mo2diag", chunks)
    got = arr.map_overlap(_diag, depth={0: 1, 1: 1}, boundary="constant")
    expect = _global_reference(dense, _diag, {0: 1, 1: 1}, "constant")
    assert np.array_equal(got.to_numpy(), expect)


def test_asymmetric_depths_and_skipped_axis(spark):
    """depth={0:2, 1:0, ...}-style: axis 1 skipped, axis 0 radius 2."""

    def k(a):
        out = a.copy()
        out[2:-2] = a[:-4] + a[4:] + a[2:-2]
        return out

    rng = np.random.default_rng(5)
    dense = rng.integers(0, 30, size=(12, 6)).astype(np.float64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 3 * j : 3 * j + 3]
        for i in range(3)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "moasym", chunks)
    got = arr.map_overlap(k, depth={0: 2, 1: 0}, boundary="nearest")
    expect = _global_reference(dense, k, {0: 2}, "nearest")
    assert np.array_equal(got.to_numpy(), expect)


def test_3d_two_axis_overlap(spark):
    def k(a):
        out = a.copy()
        out[1:-1, :, 1:-1] = a[:-2, :, :-2] + a[2:, :, 2:] + a[1:-1, :, 1:-1]
        return out

    rng = np.random.default_rng(9)
    dense = rng.integers(0, 20, size=(4, 3, 4)).astype(np.float64)
    chunks = {
        (i, 0, j): dense[2 * i : 2 * i + 2, :, 2 * j : 2 * j + 2]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mo3d", chunks)
    got = arr.map_overlap(k, depth={0: 1, 2: 1}, boundary="reflect")
    expect = _global_reference(dense, k, {0: 1, 2: 1}, "reflect")
    assert np.array_equal(got.to_numpy(), expect)


def test_ragged_chunks_2d(spark):
    rng = np.random.default_rng(21)
    dense = rng.integers(0, 40, size=(7, 5)).astype(np.float64)
    # ragged tiling: rows (4,3), cols (3,2)
    chunks = {
        (0, 0): dense[:4, :3], (0, 1): dense[:4, 3:],
        (1, 0): dense[4:, :3], (1, 1): dense[4:, 3:],
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "morag", chunks)
    got = arr.map_overlap(_five_point, depth={0: 1, 1: 1}, boundary="nearest")
    expect = _global_reference(dense, _five_point, {0: 1, 1: 1}, "nearest")
    assert np.array_equal(got.to_numpy(), expect)


def test_periodic_boundary_2d(spark):
    """dask boundary='periodic' (numpy 'wrap'): edge halos come from the
    opposite grid edge — corners wrap diagonally through the composition."""
    rng = np.random.default_rng(17)
    dense = rng.integers(0, 30, size=(8, 6)).astype(np.float64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 3 * j : 3 * j + 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "moper", chunks)
    got = arr.map_overlap(_diag, depth={0: 1, 1: 1}, boundary="periodic")
    widths = [(1, 1), (1, 1)]
    expect = _make_diag()(np.pad(dense, widths, mode="wrap"))[1:-1, 1:-1]
    assert np.array_equal(got.to_numpy(), expect)


def test_periodic_single_chunk_axis(spark):
    """nb_chunks=1 along the axis: a chunk is its own wrap neighbor."""

    def k(a):
        out = a.copy()
        out[1:-1] = a[:-2] + a[1:-1] + a[2:]
        return out

    dense = np.arange(5, dtype=np.float64)
    arr = ChunkedArray.from_numpy_chunks(spark, "moper1", {(0,): dense})
    got = arr.map_overlap(k, depth=1, axis=0, boundary="periodic")
    expect = k(np.pad(dense, (1, 1), mode="wrap"))[1:-1]
    assert np.array_equal(got.to_numpy(), expect)


def test_mixed_per_axis_boundaries(spark):
    """dask-style boundary dict {0:'periodic', 1:'reflect'}: each axis
    pads by its own mode — matched against numpy padding each axis
    sequentially with its mode."""
    rng = np.random.default_rng(23)
    dense = rng.integers(0, 30, size=(8, 6)).astype(np.float64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 3 * j : 3 * j + 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "momix", chunks)
    got = arr.map_overlap(
        _five_point, depth={0: 1, 1: 1}, boundary={0: "periodic", 1: "reflect"}
    )
    padded = np.pad(dense, [(1, 1), (0, 0)], mode="wrap")
    padded = np.pad(padded, [(0, 0), (1, 1)], mode="symmetric")
    expect = _make_five_point()(padded)[1:-1, 1:-1]
    assert np.array_equal(got.to_numpy(), expect)


def test_int_depth_back_compat_single_axis(spark):
    """The original single-axis signature (int depth + axis) unchanged."""

    def k(a):
        out = a.copy()
        out[:, 1:-1] = a[:, :-2] + a[:, 1:-1] + a[:, 2:]
        return out

    rng = np.random.default_rng(2)
    dense = rng.integers(0, 25, size=(4, 8)).astype(np.float64)
    chunks = {(0, j): dense[:, 4 * j : 4 * j + 4] for j in range(2)}
    arr = ChunkedArray.from_numpy_chunks(spark, "mo1d", chunks)
    got = arr.map_overlap(k, depth=1, axis=1, boundary="nearest")
    expect = _global_reference(dense, k, {1: 1}, "nearest")
    assert np.array_equal(got.to_numpy(), expect)


def test_persist_blocks_same_result_and_scope_release(spark):
    """persist_blocks=True caches each pass's input under the caller's
    cache_scope (computed once per pass, released on scope exit) and
    returns bit-identical results."""
    from doreisa_spark import lifecycle

    rng = np.random.default_rng(29)
    dense = rng.integers(0, 20, size=(8, 6)).astype(np.float64)
    chunks = {
        (i, j): dense[4 * i : 4 * i + 4, 3 * j : 3 * j + 3]
        for i in range(2)
        for j in range(2)
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "mopers", chunks)
    plain = arr.map_overlap(_five_point, depth={0: 1, 1: 1}, boundary="nearest")
    expect = plain.to_numpy()

    def cached_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    spark.catalog.clearCache()
    baseline = cached_ids()
    with lifecycle.cache_scope():
        cached = arr.map_overlap(
            _five_point, depth={0: 1, 1: 1}, boundary="nearest", persist_blocks=True
        )
        got = cached.to_numpy()
        assert cached_ids() - baseline  # pass inputs live in cache
    assert not cached_ids() - baseline  # released on scope exit
    assert np.array_equal(got, expect)


def test_depth_validation(spark):
    chunks = {(0, 0): np.zeros((2, 2)), (0, 1): np.zeros((2, 2)),
              (1, 0): np.zeros((2, 2)), (1, 1): np.zeros((2, 2))}
    arr = ChunkedArray.from_numpy_chunks(spark, "moval", chunks)
    with pytest.raises(ValueError, match="exceeds the smallest"):
        arr.map_overlap(lambda a: a, depth={0: 3}, boundary="nearest")
    with pytest.raises(ValueError, match="at least one axis"):
        arr.map_overlap(lambda a: a, depth={0: 0}, boundary="nearest")
    with pytest.raises(ValueError, match="out of range"):
        arr.map_overlap(lambda a: a, depth={5: 1}, boundary="nearest")

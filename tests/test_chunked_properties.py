"""Property-based differential testing: ChunkedArray ≡ numpy.

Hypothesis generates random arrays, RAGGED chunkings, and values
(including negatives, zeros, and repeated values); every property asserts
the distributed result equals numpy's on the same data. This is the
generalization of the closed-form ramp oracles: the ramp pins exact
arithmetic cross-engine, these pin SEMANTICS (tiling, offsets, masks,
reductions) across the whole input space.

Example counts are deliberately small (each example runs real Spark jobs
on the 4-cpu suite session); the derandomized profile keeps the suite
deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from doreisa_spark.plans.chunked import ChunkedArray

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def chunked_2d(draw):
    """(full ndarray, chunks dict) with ragged tiling along both axes."""
    rows = draw(st.integers(2, 12))
    cols = draw(st.integers(2, 12))
    dtype = draw(st.sampled_from(["float64", "int32"]))
    if dtype == "float64":
        vals = draw(
            st.lists(
                st.floats(-1e6, 1e6, allow_nan=False, width=64),
                min_size=rows * cols, max_size=rows * cols,
            )
        )
        full = np.array(vals, dtype=np.float64).reshape(rows, cols)
    else:
        vals = draw(
            st.lists(
                st.integers(-1000, 1000), min_size=rows * cols, max_size=rows * cols
            )
        )
        full = np.array(vals, dtype=np.int32).reshape(rows, cols)

    def splits(n):
        cuts = draw(
            st.lists(st.integers(1, n - 1), max_size=2, unique=True).map(sorted)
        ) if n > 1 else []
        return [0] + cuts + [n]

    rs, cs = splits(rows), splits(cols)
    chunks = {}
    for i in range(len(rs) - 1):
        for j in range(len(cs) - 1):
            chunks[(i, j)] = full[rs[i] : rs[i + 1], cs[j] : cs[j + 1]]
    return full, chunks


_COUNTER = [0]


def _arr(spark, chunks):
    _COUNTER[0] += 1
    return ChunkedArray.from_numpy_chunks(spark, f"prop{_COUNTER[0]}", chunks)


@settings(**_SETTINGS)
@given(data=chunked_2d())
def test_global_reductions_match_numpy(spark, data):
    full, chunks = data
    arr = _arr(spark, chunks)
    assert np.isclose(
        arr.sum().first()["total"], full.sum(dtype=np.float64), rtol=1e-12, atol=1e-9
    )
    assert np.isclose(
        arr.mean().first()["mean_value"], full.mean(dtype=np.float64), rtol=1e-12
    )
    assert arr.min().first()["min_value"] == full.min()
    assert arr.max().first()["max_value"] == full.max()


@settings(**_SETTINGS)
@given(data=chunked_2d())
def test_structural_roundtrips_match_numpy(spark, data):
    full, chunks = data
    arr = _arr(spark, chunks)
    assert np.array_equal(arr.transpose().to_numpy(), full.T)
    assert np.array_equal(arr.flip(0).to_numpy(), np.flip(full, 0))
    assert np.array_equal(
        arr.ravel().to_numpy(), full.ravel()
    )


@settings(**_SETTINGS)
@given(data=chunked_2d(), k=st.integers(-5, 5))
def test_elementwise_pipeline_matches_numpy(spark, data, k):
    full, chunks = data
    arr = _arr(spark, chunks)
    got = arr.scale(k).shift(1).abs().sum().first()["total"]
    expect = np.abs(full.astype(np.float64) * k + 1).sum()
    assert np.isclose(float(got), expect, rtol=1e-12, atol=1e-9)


@settings(**_SETTINGS)
@given(data=chunked_2d())
def test_axis_reductions_match_numpy(spark, data):
    full, chunks = data
    arr = _arr(spark, chunks)
    for axis in (0, 1):
        rows = arr.axis_sum(axis).collect()  # (coords array<int>, total)
        got = np.empty(full.shape[1 - axis], dtype=np.float64)
        for r in rows:
            got[r["coords"][0]] = float(r["total"])
        expect = full.sum(axis=axis, dtype=np.float64)
        assert np.allclose(got, expect, rtol=1e-12, atol=1e-9)


@settings(**_SETTINGS)
@given(data=chunked_2d(), thresh=st.integers(-500, 500))
def test_boolean_select_matches_numpy(spark, data, thresh):
    full, chunks = data
    arr = _arr(spark, chunks)
    mask_np = full > thresh
    if not mask_np.any():
        return  # numpy-empty contract covered by unit tests
    mask = _arr(spark, {p: (c > thresh).astype(c.dtype) for p, c in chunks.items()})
    got = arr.boolean_select(mask).to_numpy()
    assert np.array_equal(np.sort(got), np.sort(full[mask_np]))


@settings(**_SETTINGS)
@given(
    data=chunked_2d(),
    boundary=st.sampled_from(["nearest", "reflect", "constant", "periodic"]),
    d0=st.integers(0, 1),
    d1=st.integers(0, 1),
)
def test_map_overlap_nd_matches_global_pad(spark, data, boundary, d0, d1):
    """N-d map_overlap ≡ pad-the-DENSE-array-globally, apply, trim (the
    dask definition), for any ragged tiling / boundary / per-axis depth —
    the radius-1 cross kernel reads every halo cell incl. corners."""
    full, chunks = data
    if d0 == 0 and d1 == 0:
        return
    depths = {a: d for a, d in ((0, d0), (1, d1)) if d}
    for ax, d in depths.items():
        if d > min(c.shape[ax] for c in chunks.values()):
            return  # depth must fit the smallest chunk extent
    np_mode = {"nearest": "edge", "reflect": "symmetric",
               "constant": "constant", "periodic": "wrap"}[boundary]

    def make_kernel():
        def kernel(a):
            out = a.copy()
            if 0 in depths and 1 in depths:
                out[1:-1, 1:-1] = (a[:-2, :-2] + a[2:, 2:] + a[1:-1, 1:-1]
                                   + a[:-2, 2:] + a[2:, :-2])
            elif 0 in depths:
                out[1:-1, :] = a[:-2, :] + a[1:-1, :] + a[2:, :]
            else:
                out[:, 1:-1] = a[:, :-2] + a[:, 1:-1] + a[:, 2:]
            return out
        return kernel

    arr = _arr(spark, chunks)
    got = arr.map_overlap(make_kernel(), depth=depths, boundary=boundary).to_numpy()
    widths = [(depths.get(a, 0),) * 2 for a in range(2)]
    padded = np.pad(full, widths, mode=np_mode)
    sl = tuple(slice(depths.get(a, 0), depths.get(a, 0) + full.shape[a]) for a in range(2))
    expect = make_kernel()(padded)[sl].astype(full.dtype)
    assert np.array_equal(got, expect)

"""Chunked-tensor layer tests — closed-form oracles in the style of the
reference's tests (reference: tests/test_doreisa.py:18-21 asserts
``array.sum().compute() == 10 * timestep`` on known grids)."""

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
    rows = {r["idx"]: r["total"] for r in _ramp(spark).axis_sum(axis=0).collect()}
    nrows, ncols = META.global_shape
    for c in range(ncols):
        assert rows[c] == sum(r + c for r in range(nrows))


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


def test_irregular_chunk_rejected(spark):
    chunks = {(0,): np.ones(4), (1,): np.ones(5)}
    with pytest.raises(ValueError, match="irregular"):
        ChunkedArray.from_numpy_chunks(spark, "bad", chunks)


def test_preprocess_at_generation(spark):
    # preprocess 10x at ingest (reference: tests/test_preprocessing_callback.py)
    arr = ChunkedArray.from_function(spark, META, ramp_chunk, preprocess=lambda a: 10 * a)
    assert arr.sum().collect()[0]["total"] == 10 * expected_sum_arithmetic(META)

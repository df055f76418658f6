"""Chunked-tensor queries — the doreisa core capability surface
(global reductions, elementwise algebra, scalar broadcast, axis
reductions over a distributed chunk grid) exposed through the driver's
correctness gate.

The grid is generated ON THE EXECUTORS from a closed-form function
(A[r, c] = r + c, integer-valued → exact in float64), and each DuckDB
oracle recomputes the same quantity independently over `range()` series —
so these check the entire distributed tensor pipeline (generation,
chunk kernels, position joins, partial+final reduction) against an
engine that never saw a chunk.

Mirrors the reference's exercised dask.array surface: sum / mean /
elementwise subtract between timesteps / scalar multiply
(tests/test_doreisa.py:20, test_sliding_window.py:27,
test_preprocessing_callback.py:24, docs/analytics.md:30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.plans.chunked import ChunkedArray, GridMeta, ramp_chunk
from doreisa_spark.registry import register

_GRID = (4, 4)
_CHUNK = (64, 64)
_META = GridMeta("grid", _GRID, _CHUNK)
_ROWS = _GRID[0] * _CHUNK[0]
_COLS = _GRID[1] * _CHUNK[1]

# DuckDB series over the same global index space.
_DUCK_GRID = (
    f"(SELECT r.range AS r, c.range AS c FROM range(0, {_ROWS}) r, range(0, {_COLS}) c)"
)


def _ramp(spark: SparkSession, timestep: int = 0, scale_t: bool = False) -> ChunkedArray:
    """A[r,c] = r + c (or (t+1)·(r+c) when scale_t, emulating per-timestep
    simulation output as in the reference's tests, tests/utils.py:26-47)."""
    t = timestep

    if scale_t:

        def fn(pos, shape):
            return (t + 1) * ramp_chunk(pos, shape)

    else:
        fn = ramp_chunk
    return ChunkedArray.from_function(spark, _META, fn, timestep=t)


@register(
    "tensor_global_sum",
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array.sum() over a {_GRID} grid of {_CHUNK} chunks: per-chunk
    sequential fold (JVM) + final 1-row aggregate — partial+final, no
    driver materialization (reference analog: tests/test_doreisa.py:20)."""
    return _ramp(spark).sum()


@register(
    "tensor_global_mean",
    oracle=f"SELECT CAST(avg(r + c) AS DOUBLE) AS mean_value FROM {_DUCK_GRID}",
)
def tensor_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array.mean() = sum+count partials (docs/analytics.md:30 analog).

    Mean of integers: exact sum / exact count → bit-identical division."""
    return _ramp(spark).mean()


@register(
    "tensor_scalar_mul_sum",
    oracle=f"SELECT CAST(sum(10 * (r + c)) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_scalar_mul_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(10 * A).sum(): scalar broadcast via JVM `transform` on the chunk
    payload (reference analog: the 10·x preprocess,
    tests/test_preprocessing_callback.py:24)."""
    return _ramp(spark).scale(10.0).sum()


@register(
    "tensor_elementwise_sub_sum",
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_elementwise_sub_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(A[t=1] - A[t=0]).sum() with A_t = (t+1)·ramp → difference equals the
    ramp. Elementwise op across timesteps = position join + zip_with
    (reference analog: tests/test_sliding_window.py:27)."""
    a0 = _ramp(spark, timestep=0, scale_t=True)
    a1 = _ramp(spark, timestep=1, scale_t=True)
    return a1.zip_with(a0, "-").sum()


@register(
    "tensor_axis_sum",
    oracle=f"""
SELECT c AS idx, CAST(sum(r + c) AS DOUBLE) AS total
FROM {_DUCK_GRID}
GROUP BY c
""",
)
def tensor_axis_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Axis-0 reduction: per-chunk numpy partial (Arrow batch) → shuffle of
    reduced vectors only → per-column totals ({_COLS} rows out)."""
    df = _ramp(spark).axis_sum(axis=0)
    return df.select(F.col("idx").alias("idx"), F.col("total"))


@register(
    "tensor_preprocess_chain",
    oracle=f"SELECT CAST(sum(2 * (r + c) + 5) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_preprocess_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained elementwise ops WITHOUT intermediate shuffles: numpy
    preprocess at generation (2·x, the ingest-side callback analog,
    simulation_node.py:57) then JVM shift (+5), then reduce. The whole
    chain is one narrow pipeline per chunk — fused, never materialized."""
    arr = ChunkedArray.from_function(
        spark, _META, ramp_chunk, preprocess=lambda a: 2.0 * a
    )
    return arr.shift(5.0).sum()

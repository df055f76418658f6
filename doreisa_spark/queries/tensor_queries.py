"""Chunked-tensor queries — the doreisa core capability surface
(global reductions, elementwise algebra, scalar broadcast, axis
reductions over a distributed chunk grid) exposed through the driver's
correctness gate.

The grid is generated ON THE EXECUTORS from a closed-form expression
(A[r, c] = r + c, integer-valued → exact in float64), and each DuckDB
oracle recomputes the same quantity independently over `range()` series —
so these check the entire distributed tensor pipeline (generation,
chunk kernels, position joins, partial+final reduction) against an
engine that never saw a chunk.

Generation is lazy/virtual (plans/chunked.py): a reduction over a
generated grid fuses generate → elementwise chain → per-chunk partial
into ONE Arrow-batched numpy stage, so only one partial value per chunk
ever reaches the JVM. (Catalyst higher-order functions were measured
interpreted per-element — 234 s for a 537 MB fold vs seconds fused — see
the chunked.py module docstring.)

Grid sizing: at correctness scale (sf < 0.05) a 4×4 grid of 64×64
chunks matches the DuckDB oracle's range() extent; at bench scale the
grid grows to 16×16 chunks of 512×512 float64 ≈ 537 MB so the reported
time reflects data volume, not per-stage fixed cost.

Mirrors the reference's exercised dask.array surface: sum / mean /
elementwise subtract between timesteps / scalar multiply
(tests/test_doreisa.py:20, test_sliding_window.py:27,
test_preprocessing_callback.py:24, docs/analytics.md:30).
"""

from __future__ import annotations

import os
import re

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.operators.literal import literal_frame
from doreisa_spark.plans.chunked import (
    ChunkedArray,
    GridMeta,
    expected_sum_arithmetic,
    ramp_chunk,
)
from doreisa_spark.registry import register

_GRID = (4, 4)
_CHUNK = (64, 64)
_META = GridMeta("grid", _GRID, _CHUNK)
_BENCH_META = GridMeta("grid", (16, 16), (512, 512))
_ROWS = _GRID[0] * _CHUNK[0]
_COLS = _GRID[1] * _CHUNK[1]

# DuckDB series over the same global index space (correctness scale).
_DUCK_GRID = (
    f"(SELECT r.range AS r, c.range AS c FROM range(0, {_ROWS}) r, range(0, {_COLS}) c)"
)


def _meta_for(sf_dir: str) -> GridMeta:
    """Correctness runs (sf ≤ 0.01) use the oracle-matched small grid;
    bench runs (sf ≥ 0.05) use the ~537 MB grid so timings mean
    throughput."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    return _BENCH_META if sf >= 0.05 else _META


def _ramp(spark: SparkSession, sf_dir: str, timestep: int = 0, scale_t: bool = False) -> ChunkedArray:
    """A[r,c] = r + c (or (t+1)·(r+c) when scale_t, emulating per-timestep
    simulation output as in the reference's tests, tests/utils.py:26-47).
    Virtual: chunks are generated on the executors and fuse with the
    downstream reduction into a single Python stage."""
    if scale_t:
        k = float(timestep + 1)

        def fn(pos, shape):
            return k * ramp_chunk(pos, shape)

    else:
        fn = ramp_chunk
    return ChunkedArray.from_function(spark, _meta_for(sf_dir), fn, timestep=timestep)


@register(
    "tensor_global_sum",
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array.sum(): per-chunk sequential fold (JVM) + final 1-row
    aggregate — partial+final, no driver materialization (reference
    analog: tests/test_doreisa.py:20)."""
    return _ramp(spark, sf_dir).sum()


@register(
    "tensor_global_mean",
    extended=True,  # sum+count variant of tensor_global_sum; keeps the
    # primary tier at the driver's 50-query budget
    oracle=f"SELECT CAST(avg(r + c) AS DOUBLE) AS mean_value FROM {_DUCK_GRID}",
)
def tensor_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array.mean() = sum+count partials (docs/analytics.md:30 analog).

    Mean of integers: exact sum / exact count → bit-identical division."""
    return _ramp(spark, sf_dir).mean()


@register(
    "tensor_global_std",
    extended=True,
    oracle=f"""
WITH t AS (
  SELECT CAST(sum(CAST((r + c) * (r + c) AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(r + c) AS BIGINT) AS s,
         count(*) AS n
  FROM {_DUCK_GRID}
)
SELECT sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS std_value
FROM t
""",
)
def tensor_global_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array.std(): (sum, sum-of-squares, count) partials per chunk → one
    final row. Integer-valued grid → partials exact, and the final
    expression uses the same explicit IEEE operation order in both
    engines, so the doubles agree bit-for-bit."""
    return _ramp(spark, sf_dir).std()


@register(
    "tensor_scalar_mul_sum",
    oracle=f"SELECT CAST(sum(10 * (r + c)) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_scalar_mul_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(10 * A).sum(): scalar broadcast via JVM `transform` on the chunk
    payload (reference analog: the 10·x preprocess,
    tests/test_preprocessing_callback.py:24)."""
    return _ramp(spark, sf_dir).scale(10.0).sum()


@register(
    "tensor_elementwise_sub_sum",
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_elementwise_sub_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(A[t=1] - A[t=0]).sum() with A_t = (t+1)·ramp → difference equals the
    ramp. Elementwise op across timesteps = position join + zip_with
    (reference analog: tests/test_sliding_window.py:27)."""
    a0 = _ramp(spark, sf_dir, timestep=0, scale_t=True)
    a1 = _ramp(spark, sf_dir, timestep=1, scale_t=True)
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
    reduced vectors only → per-column totals."""
    df = _ramp(spark, sf_dir).axis_sum(axis=0)
    return df.select(
        F.col("coords")[0].cast("bigint").alias("idx"), F.col("total")
    )


@register(
    "tensor_preprocess_chain",
    oracle=f"SELECT CAST(sum(2 * (r + c) + 5) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_preprocess_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained elementwise ops WITHOUT intermediate shuffles: numpy
    preprocess at generation (2·x, the ingest-side callback analog,
    simulation_node.py:57) then JVM shift (+5), then reduce. The whole
    chain is one narrow pipeline per chunk — fused, never materialized.
    Keeps the `mapInPandas` generation path: this is the genuine
    user-kernel route the JVM generator can't replace."""
    arr = ChunkedArray.from_function(
        spark, _meta_for(sf_dir), ramp_chunk, preprocess=lambda a: 2.0 * a
    )
    return arr.shift(5.0).sum()


def _asym_chunk(pos: tuple[int, ...], shape: tuple[int, ...]):
    """A[r, c] = r + 2c — asymmetric on purpose: the symmetric ramp would
    make a transpose bug invisible."""
    import numpy as np

    r = np.arange(pos[0] * shape[0], (pos[0] + 1) * shape[0], dtype=np.float64)
    c = np.arange(pos[1] * shape[1], (pos[1] + 1) * shape[1], dtype=np.float64)
    return r[:, None] + 2.0 * c[None, :]


@register(
    "tensor_transpose_axis_sum",
    extended=True,
    oracle=f"""
SELECT r AS idx, CAST(sum(r + 2 * c) AS DOUBLE) AS total
FROM {_DUCK_GRID}
GROUP BY r
""",
)
def tensor_transpose_axis_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transpose then axis-reduce: B = Aᵀ with A[r,c] = r + 2c, axis-0 sum
    of B = per-row sums of A. Transpose is map-only (pos reorder + lazy
    numpy view); a wrong payload/pos permutation breaks the hash. Uses the
    gate grid at every sf — a correctness entry, not a bench entry."""
    arr = ChunkedArray.from_function(spark, _META, _asym_chunk)
    df = arr.transpose().axis_sum(axis=0)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


_CONCAT_ROWS = 2 * _CHUNK[0]  # a 2×4-chunk second block stacked below


@register(
    "tensor_concat_sum",
    extended=True,
    oracle=f"""
SELECT CAST(
  (SELECT sum(r + c) FROM {_DUCK_GRID})
  + (SELECT sum(r.range + c.range)
     FROM range(0, {_CONCAT_ROWS}) r, range(0, {_COLS}) c)
  AS DOUBLE) AS total
""",
)
def tensor_concat_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concatenate along an existing axis then reduce: the full gate ramp
    with a half-height ramp appended below (each block generated with its
    own local coordinates). Union + pos shift only — a wrong offset or a
    dropped block breaks the closed-form total."""
    top = ChunkedArray.from_function(spark, _META, ramp_chunk)
    bottom = ChunkedArray.from_function(
        spark, GridMeta("grid", (2, _GRID[1]), _CHUNK), ramp_chunk
    )
    return ChunkedArray.concatenate([top, bottom], axis=0).sum()


@register(
    "tensor_ufunc_chain",
    extended=True,
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_ufunc_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt(square(A)).sum() == A.sum() for the non-negative ramp: the
    chained ufuncs stay one fused Python stage (no materialization
    between them) and must recover the identity exactly — ramp values are
    integers whose squares are exact in float64, and sqrt of an exact
    square is correctly rounded to the integer."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.ufunc("square").ufunc("sqrt").sum()


@register(
    "tensor_minmax",
    extended=True,
    oracle=f"""
SELECT CAST(min(r + c) AS DOUBLE) AS min_value,
       CAST(max(r + c) AS DOUBLE) AS max_value
FROM {_DUCK_GRID}
""",
)
def tensor_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max reductions — comparison-only partials per chunk,
    one row out of each, joined into a single (min_value, max_value)
    row."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.min().crossJoin(arr.max())


@register(
    "tensor_bench_grid_sum",
    extended=True,
    # Closed-form oracle: sum over the BENCH grid of A[r,c] = r + c is
    # R·C·(R+C-2)/2 — computed by the same helper the pytest suite trusts
    # (expected_sum_arithmetic), emitted as a constant so DuckDB verifies
    # the exact 16×16×512×512 tiling the bench runs, not the small gate
    # grid. Total ≈ 5.5e11 < 2^53, so float64 partials are exact at any
    # summation order.
    oracle=(
        "SELECT CAST("
        f"{expected_sum_arithmetic(_BENCH_META)!r}"
        " AS DOUBLE) AS total"
    ),
)
def tensor_bench_grid_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sum over the BENCH-SCALE grid meta, independent of sf_dir.

    Every other tensor oracle pins the 256×256 gate grid, so a
    stride/offset bug that only manifests on the 16×16×512×512 tiling
    (the one bench.py times) would pass the gate while shipping wrong
    bench numbers. This entry closes that hole: same generator, same
    fused reduce path, bench meta, closed-form expected value."""
    return ChunkedArray.from_function(spark, _BENCH_META, ramp_chunk).sum()


@register(
    "tensor_rechunk_sum",
    extended=True,
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_rechunk_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rechunk (re-tiling shuffle) then reduce: content is invariant, so
    the oracle is the plain global sum — a wrong split/assemble in the
    rechunk path shows up as a hash mismatch. Uses an uneven target tiling
    to exercise the ragged-boundary piece logic."""
    arr = _ramp(spark, sf_dir)
    rows, cols = arr.meta.global_shape
    # deliberately unaligned target tiles (ragged last tile per dim)
    return arr.rechunk((max(rows // 3, 1), max(cols // 5, 1))).sum()


@register(
    "tensor_matmul_sum",
    extended=True,
    oracle=f"""
WITH a AS (SELECT c AS k, sum(r + c) AS colsum FROM {_DUCK_GRID} GROUP BY c),
     b AS (SELECT r AS k, sum(r + c) AS rowsum FROM {_DUCK_GRID} GROUP BY r)
SELECT CAST(sum(a.colsum * b.rowsum) AS DOUBLE) AS total
FROM a JOIN b USING (k)
""",
)
def tensor_matmul_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(A @ A) for the square ramp grid via the distributed block
    matmul (SUMMA-style join-on-k + per-pair BLAS + groupBy-sum of partial
    blocks). Oracle identity: sum(A@B) = Σ_k colsum_A(k)·rowsum_B(k).

    Exactness: at gate scale (≤ 1024²) every accumulation stays below
    2^53, so float64 partials are exact and summation order is
    irrelevant. (At the bench grid the total would exceed 2^53 — this is
    a correctness-gate entry, not a bench entry.)"""
    a = _ramp(spark, sf_dir)
    return a.matmul(a).sum()


@register(
    "tensor_cumsum_sum",
    extended=True,
    # cumsum along axis 0 then total: element (r,c) of the cumsum grid is
    # counted once for every row >= r, so the total is Σ (R - r)·(r + c) —
    # an independent closed form the two-pass distributed scan must hit.
    oracle=f"SELECT CAST(sum(({_ROWS} - r) * (r + c)) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_cumsum_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cumsum(axis=0).sum(): the two-pass distributed prefix scan (local
    cumsum + per-chunk totals → exclusive prefix per cross position →
    offset add) followed by the global reduce. A wrong offset, a skipped
    chunk, or a mis-sorted prefix group all shift the closed-form total.
    Integer-valued float64 grid → every partial < 2^53, exact."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.axis_cumsum(axis=0).sum()


@register(
    "tensor_diff_sum",
    extended=True,
    # d/dr of (r+c)^2 is 2(r+c)+1 on the (ROWS-1)×COLS output grid — the
    # finite-difference stencil must reproduce the derivative exactly
    # (integer-valued squares < 2^53 stay exact in float64).
    oracle=(
        f"SELECT CAST(sum(2 * (r.range + c.range) + 1) AS DOUBLE) AS total "
        f"FROM range(0, {_ROWS - 1}) r, range(0, {_COLS}) c"
    ),
)
def tensor_diff_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diff(A², axis=0).sum(): square fuses into the chunk pipeline, then
    the halo-exchange stencil (each chunk pulls ONE hyperplane from its
    axis-successor — a narrow frame, never chunk bodies twice), then the
    global reduce. A wrong halo, offset, or dropped boundary plane shifts
    the closed-form derivative total."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.ufunc("square").axis_diff(axis=0).sum()


@register(
    "tensor_where_sum",
    extended=True,
    # where(A-15 != 0, A, -A): flip the sign of exactly the anti-diagonal
    # band r+c == 15 — a closed form DuckDB evaluates per cell.
    oracle=(
        f"SELECT CAST(sum(CASE WHEN r + c <> 15 THEN r + c ELSE -(r + c) END) AS DOUBLE)"
        f" AS total FROM {_DUCK_GRID}"
    ),
)
def tensor_where_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where(cond, A, -A).sum(): the ternary select over three same-grid
    arrays. All three sides are virtual here, so the select fuses into ONE
    generation closure — zero shuffles, zero materialization — yet the
    semantics are the full three-array np.where (NaN-safe lane selection,
    not a mask multiply). Gate grid at every sf — a correctness entry."""
    a = ChunkedArray.from_function(spark, _META, ramp_chunk)
    cond = ChunkedArray.from_function(spark, _META, ramp_chunk).shift(-15.0)
    b = ChunkedArray.from_function(spark, _META, ramp_chunk).scale(-1.0)
    return a.where(cond, b).sum()


@register(
    "tensor_matvec",
    extended=True,
    # (A · v)[r] with v[c] = c+1: per-row closed form the broadcast
    # multiply + axis reduction must reproduce.
    oracle=f"""
SELECT r AS idx, CAST(sum((r + c) * (c + 1)) AS DOUBLE) AS total
FROM {_DUCK_GRID}
GROUP BY r
""",
)
def tensor_matvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed matrix-vector product as a composition:
    ``A.scale_axis(v, 1).axis_sum(1)``. The vector broadcast rides the
    fused map-only pipeline (each chunk multiplies by its slice); the only
    shuffle carries the reduced per-row partials — the exact plan a 100 TB
    mat-vec wants. Gate grid at every sf — a correctness entry."""
    import numpy as np

    v = np.arange(1, _COLS + 1, dtype=np.float64)
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    df = arr.scale_axis(v, axis=1).axis_sum(axis=1)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_reshape_axis_sum",
    extended=True,
    # reshape (R,C) -> (2R, C/2) in C order: new column j collects every
    # flat index f with f % (C/2) == j; value at f is (f // C) + (f % C).
    # Per-new-column totals are a closed form only a correct element
    # placement can hit (a transposed or mis-spanned reshape shifts them).
    oracle=f"""
SELECT CAST(range % {_COLS // 2} AS BIGINT) AS idx,
       CAST(sum((range // {_COLS}) + (range % {_COLS})) AS DOUBLE) AS total
FROM range(0, {_ROWS * _COLS})
GROUP BY range % {_COLS // 2}
""",
)
def tensor_reshape_axis_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reshape((2R, C/2)).axis_sum(0): the C-order re-span (ravel is
    metadata-only for the slab case; the ramp's (4,4) tiling takes the
    one-move rechunk path) followed by a per-column reduction. Gate grid
    at every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    df = arr.reshape((2 * _ROWS, _COLS // 2)).axis_sum(axis=0)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_masked_sum",
    extended=True,
    # boolean-mask indexing: keep elements where (r+c) % 3 == 0, sum them.
    oracle=f"""
SELECT CAST(sum(r + c) AS DOUBLE) AS total
FROM {_DUCK_GRID}
WHERE (r + c) % 3 = 0
""",
)
def tensor_masked_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a[mask].sum() — dask-style boolean indexing: the mask grid rides
    the same fused pipeline, both sides ravel (zero-move when
    slab-tiled), per-chunk selection in the Arrow batch, data-dependent
    chunk sizes resolved from counts only (no element data to the
    driver). Gate grid at every sf — a correctness entry."""
    import numpy as np

    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    cond = ChunkedArray.from_function(spark, _META, ramp_chunk).map_numpy(
        lambda a: (np.mod(a, 3.0) == 0.0).astype(np.float64)
    )
    return arr.boolean_select(cond).sum()


@register(
    "tensor_tensordot_total",
    extended=True,
    # full contraction tensordot(A, B, axes=((0,1),(0,1))) = sum(A ⊙ B)
    # with B[r,c] = r + 2c — asymmetric so a transposed operand misses.
    oracle=f"SELECT CAST(sum((r + c) * (r + 2*c)) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_tensordot_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tensordot over both axes via the general lowering (transpose →
    reshape to 2-D → block matmul → reshape back): a 1-element result
    array whose sum() is a closed form. Exercises the whole
    transpose/ravel/re-span/matmul composition in one entry. Gate grid
    at every sf — a correctness entry."""
    a = ChunkedArray.from_function(spark, _META, ramp_chunk)
    b = ChunkedArray.from_function(spark, _META, _asym_chunk)
    return a.tensordot(b, axes=((0, 1), (0, 1))).sum()


_TAKE_IDX = [1, 1, 6, 200, 33]  # reorder + duplicate + cross-chunk


@register(
    "tensor_take_sum",
    extended=True,
    # fancy indexing take(rows): selected-row total with duplicate
    # multiplicity — Σ_j Σ_c (idx_j + c).
    oracle=f"""
SELECT CAST(sum(i.r + c.range) AS DOUBLE) AS total
FROM (SELECT unnest({_TAKE_IDX}) AS r) i, range(0, {_COLS}) c
""",
)
def tensor_take_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take(indices, axis=0).sum(): integer-array indexing with
    duplicates and reordering across chunk boundaries — the gather
    split/assemble (rechunk shape) followed by the global reduce.
    Gate grid at every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.take(_TAKE_IDX, axis=0).sum()


@register(
    "tensor_topk_values",
    extended=True,
    oracle=f"""
SELECT CAST(r + c AS DOUBLE) AS value
FROM {_DUCK_GRID}
ORDER BY value DESC LIMIT 8
""",
)
def tensor_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(8): per-chunk np.partition selection (O(chunk), no sort)
    inside the fused stage, global TakeOrderedAndProject over n_chunks·k
    rows. Gate grid at every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.topk(8)


@register(
    "tensor_histogram",
    extended=True,
    # 8 fixed-width bins of r+c over [0, 512): bin = (r+c) // 64, every
    # internal edge lands right-open exactly like np.histogram.
    oracle=f"""
SELECT CAST(b AS INTEGER) AS bin,
       CAST(b * 64 AS DOUBLE) AS lo,
       CAST((b + 1) * 64 AS DOUBLE) AS hi,
       count(*) AS count
FROM (SELECT (r + c) // 64 AS b FROM {_DUCK_GRID})
GROUP BY b
""",
)
def tensor_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram(8, [0,512)): per-chunk np.histogram partials (map-side
    combine) → groupBy-sum of n_chunks·bins tiny rows. Gate grid at every
    sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.histogram(8, (0.0, 512.0))


@register(
    "tensor_flip_axis_sum",
    extended=True,
    # flip(0) then row sums: row r's total lands at coordinate R-1-r.
    oracle=f"""
SELECT CAST({_ROWS} - 1 - r AS BIGINT) AS idx,
       CAST(sum(r + c) AS DOUBLE) AS total
FROM {_DUCK_GRID}
GROUP BY r
""",
)
def tensor_flip_axis_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flip(axis=0).axis_sum(1): the zero-move mirror (pos rewrite +
    in-chunk reverse) composed with a reduction — a misplaced mirror
    shifts every coordinate. Gate grid at every sf — a correctness
    entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    df = arr.flip(axis=0).axis_sum(axis=1)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_roll_axis_sum",
    extended=True,
    # roll(5, axis=1) then column sums: column c's total lands at (c+5)%C.
    oracle=f"""
SELECT CAST((c + 5) % {_COLS} AS BIGINT) AS idx,
       CAST(sum(r + c) AS DOUBLE) AS total
FROM {_DUCK_GRID}
GROUP BY c
""",
)
def tensor_roll_axis_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """roll(5, axis=1).axis_sum(0): the slice+concat circular shift
    composed with a reduction — an off-by-one in either slice boundary
    shifts the whole coordinate map. Gate grid at every sf — a
    correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    df = arr.roll(5, axis=1).axis_sum(axis=0)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


def _mod_chunk(pos: tuple[int, ...], shape: tuple[int, ...]):
    """A[r, c] = (7r + c) mod 101 — non-monotone along every axis, so the
    per-column argmin position varies and any index/tie bug shows."""
    import numpy as np

    r = np.arange(pos[0] * shape[0], (pos[0] + 1) * shape[0], dtype=np.int64)
    c = np.arange(pos[1] * shape[1], (pos[1] + 1) * shape[1], dtype=np.int64)
    return ((7 * r[:, None] + c[None, :]) % 101).astype(np.float64)


@register(
    "tensor_axis_argmin",
    extended=True,
    oracle=f"""
SELECT idx, index, value FROM (
  SELECT c AS idx, r AS index,
         CAST((7*r + c) % 101 AS DOUBLE) AS value,
         row_number() OVER (
           PARTITION BY c ORDER BY (7*r + c) % 101, r) AS rk
  FROM {_DUCK_GRID})
WHERE rk = 1
""",
)
def tensor_axis_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """axis_argmin(0) over a modular grid: per-chunk arg partials →
    struct-ordered final aggregate (first-occurrence ties, numpy
    semantics). Gate grid at every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, _mod_chunk)
    df = arr.axis_argmin(axis=0)
    return df.select(
        F.col("coords")[0].cast("bigint").alias("idx"),
        F.col("index"),
        F.col("value"),
    )


@register(
    "tensor_einsum_rowsum",
    extended=True,
    # einsum('ij,kj->ik') = A · Bᵀ with A=ramp (r+c), B=asym (r+2c);
    # axis_sum(0) leaves one total per k: sum over i,j of A[i,j]·B[k,j]
    # — the join on the shared j index is the closed form. A transposed
    # operand, wrong contraction axis, or mis-permuted output all miss.
    oracle=f"""
SELECT CAST(b.r AS BIGINT) AS idx,
       CAST(sum((a.r + a.c) * (b.r + 2*b.c)) AS DOUBLE) AS total
FROM {_DUCK_GRID} a JOIN {_DUCK_GRID} b ON a.c = b.c
GROUP BY b.r
""",
)
def tensor_einsum_rowsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """einsum('ij,kj->ik') — contraction on the SECOND axis of both
    operands (tensordot can't express it without an explicit transpose)
    — then a per-k axis reduction. Exercises the full einsum lowering:
    contracted-letter mapping → transpose → reshape → block matmul →
    output permutation. Gate grid at every sf — a correctness entry."""
    a = ChunkedArray.from_function(spark, _META, ramp_chunk)
    b = ChunkedArray.from_function(spark, _META, _asym_chunk)
    df = a.einsum("ij,kj->ik", b).axis_sum(axis=0)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_pad_rowsum",
    extended=True,
    # pad(((1,2),(3,4)), cval=5): padded grid is (R+3)×(C+7); interior
    # cell (r,c) holds (r-1)+(c-3); the border holds 5. Per-row sums gate
    # both edge-chunk placement and the constant fill.
    oracle=f"""
SELECT CAST(r.range AS BIGINT) AS idx,
       CAST(sum(CASE WHEN r.range BETWEEN 1 AND {_ROWS}
                      AND c.range BETWEEN 3 AND {_COLS + 2}
                     THEN (r.range - 1) + (c.range - 3) ELSE 5 END) AS DOUBLE) AS total
FROM range(0, {_ROWS + 3}) r, range(0, {_COLS + 7}) c
GROUP BY r.range
""",
)
def tensor_pad_rowsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pad(constant).axis_sum(1): the pure-map edge-chunk pad fused into
    the pipeline, then the per-row reduction. Gate grid at every sf — a
    correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    df = arr.pad(((1, 2), (3, 4)), constant_value=5.0).axis_sum(axis=1)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_sort_weighted",
    extended=True,
    # np.sort along axis 1 of v(r,c) = (r + 5c) % 17, then the
    # position-weighted row sum Σ sorted[c]·(c+1): only the correct
    # ascending per-row order hits it (ties contribute equally under any
    # stable order, so the closed form is rank-unambiguous).
    oracle=f"""
WITH v AS (
  SELECT r, c, CAST((r + 5 * c) % 17 AS DOUBLE) AS val FROM {_DUCK_GRID}
), rk AS (
  SELECT r, val, row_number() OVER (PARTITION BY r ORDER BY val) AS posn FROM v
)
SELECT CAST(r AS BIGINT) AS idx, CAST(sum(val * posn) AS DOUBLE) AS total
FROM rk GROUP BY r
""",
)
def tensor_sort_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort(axis=1) → scale_axis(1..C) → axis_sum(1): the contiguous-axis
    rechunk + in-slab sort, gated by an order-sensitive weighted sum.
    Gate grid at every sf — a correctness entry."""
    import numpy as np

    def mod_chunk(pos, shape):
        r = np.arange(pos[0] * shape[0], (pos[0] + 1) * shape[0], dtype=np.float64)
        c = np.arange(pos[1] * shape[1], (pos[1] + 1) * shape[1], dtype=np.float64)
        return np.mod(r[:, None] + 5.0 * c[None, :], 17.0)

    w = np.arange(1, _COLS + 1, dtype=np.float64)
    arr = ChunkedArray.from_function(spark, _META, mod_chunk)
    df = arr.sort(axis=1).scale_axis(w, axis=1).axis_sum(axis=1)
    return df.select(F.col("coords")[0].cast("bigint").alias("idx"), F.col("total"))


@register(
    "tensor_diagonal_sum",
    extended=True,
    # diagonal(offset=3) of the ramp r+c: element i is 2i+3, i < R-3
    # (square grid) — Σ = closed form over one range.
    oracle=f"""
SELECT CAST(sum(2 * range + 3) AS DOUBLE) AS total FROM range(0, {_ROWS - 3})
""",
)
def tensor_diagonal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """diagonal(3).sum(): the ravel + flat-index gather lowering — wrong
    stride, offset sign, or length all miss the closed form. Gate grid
    at every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.diagonal(3).sum()


@register(
    "tensor_broadcast_mul_sum",
    extended=True,
    # broadcast v[c] = 2c+1 (tiled to the ramp's grid) ⊙ asym (r+2c),
    # summed: Σ_{r,c} (2c+1)(r+2c).
    oracle=f"SELECT CAST(sum((2*c + 1) * (r + 2*c)) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_broadcast_mul_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """broadcast_to a (C,) vector onto the (R,C) grid — tiling pinned to
    the consumer's grid so the elementwise join is co-gridded — then
    multiply and reduce. Gate grid at every sf — a correctness entry."""
    import numpy as np

    v_chunks = {
        (i,): 2.0 * np.arange(i * _CHUNK[1], (i + 1) * _CHUNK[1], dtype=np.float64) + 1.0
        for i in range(_GRID[1])
    }
    v = ChunkedArray.from_numpy_chunks(spark, "bcastv", v_chunks)
    b = ChunkedArray.from_function(spark, _META, _asym_chunk)
    return v.broadcast_to((_ROWS, _COLS), chunks=(_CHUNK[0],)).zip_with(b, "*").sum()


@register(
    "tensor_unique_counts",
    extended=True,
    # ramp values r+c over the square grid: value v occurs
    # min(v, R-1, C-1, R+C-2-v)+1 times — expressed directly as the
    # grouped grid count.
    oracle=f"""
SELECT CAST(r + c AS DOUBLE) AS value, count(*) AS n_occurrences
FROM {_DUCK_GRID}
GROUP BY r + c
""",
)
def tensor_unique_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unique(): per-chunk np.unique map-side combine → one narrow hash
    aggregate on distinct values (no element shuffle). Gate grid at
    every sf — a correctness entry."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.unique()


@register(
    "tensor_complex_sum",
    extended=True,
    # complex ramp z[r,c] = (r+c) + 2(r+c)i: the paired-double partial
    # transport must reproduce Σ(r+c) and 2Σ(r+c) exactly.
    oracle=f"""
SELECT CAST(sum(r + c) AS DOUBLE) AS total_re,
       CAST(sum(2 * (r + c)) AS DOUBLE) AS total_im
FROM {_DUCK_GRID}
""",
)
def tensor_complex_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum() over a complex128 ramp — the any-dtype parity crumb
    (reference accepts arbitrary numpy dtypes, head_node.py:84): chunk
    partials cross the Arrow→JVM hop as (re, im) double pairs with
    per-component NaN markers. Gate grid at every sf — a correctness
    entry."""
    import numpy as np

    def cx_chunk(pos, shape):
        base = ramp_chunk(pos, shape).astype(np.complex128)
        return base + 2j * base

    meta = GridMeta("cxgrid", _GRID, _CHUNK, dtype="complex128")
    arr = ChunkedArray.from_function(spark, meta, cx_chunk)
    return arr.sum()


@register(
    "tensor_coarsen_mean",
    extended=True,
    # Sum of 2x2 block means == total/4 in EXACT arithmetic; every block
    # mean of the integer ramp is a .5-grained double (exactly
    # representable) and all partial sums stay < 2^53, so both engines'
    # folds are exact and the division-once oracle matches bit-for-bit.
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) / 4 AS total FROM {_DUCK_GRID}",
)
def tensor_coarsen_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask.array.coarsen(mean, {0: 2, 1: 2}): 2x2 mean-pool the ramp,
    then global sum — the downsample-for-output step of an in-situ
    pipeline. Coarsening is a LAZY per-chunk reshape+mean fused into the
    generator stage (zero shuffle, blocks never straddle chunks); the
    reduction then runs on an array of half the size per axis."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.coarsen("mean", {0: 2, 1: 2}).sum()


@register(
    "tensor_coarsen_max",
    extended=True,
    # max over a 2x2 block of A[r,c] = r + c at block (rb, cb) is
    # (2rb + 1) + (2cb + 1); sum that closed form over the halved grid.
    oracle=f"""
SELECT CAST(sum(2 * rb.range + 2 * cb.range + 2) AS DOUBLE) AS total
FROM range(0, {_ROWS // 2}) rb, range(0, {_COLS // 2}) cb
""",
)
def tensor_coarsen_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coarsen(max, 2x2) — max-pooling flavor of tensor_coarsen_mean
    (dtype-preserving, the image-pyramid reduction); closed-form oracle
    over the coarsened index space."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.coarsen("max", {0: 2, 1: 2}).sum()


def nan_ramp_chunk(pos: tuple, shape: tuple):
    """ramp_chunk with NaN holes at every element where (r + c) % 97 == 0
    — a deterministic missing-data pattern both engines can reproduce."""
    import numpy as np

    arr = ramp_chunk(pos, shape)
    arr[np.mod(arr, 97) == 0] = np.nan
    return arr


@register(
    "tensor_nansum",
    extended=True,
    oracle=f"""
SELECT CAST(sum(CASE WHEN (r + c) % 97 = 0 THEN 0 ELSE r + c END) AS DOUBLE) AS total
FROM {_DUCK_GRID}
""",
)
def tensor_nansum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN-skipping global sum (dask/numpy nansum) over a ramp with a
    deterministic missing-data pattern — the reduction a simulation
    analytics callback runs when sensors drop samples. Integer-valued
    non-NaN elements keep every partial exact."""
    arr = ChunkedArray.from_function(spark, _META, nan_ramp_chunk)
    return arr.nansum()


@register(
    "tensor_nanmean",
    extended=True,
    oracle=f"""
SELECT CAST(sum(CASE WHEN (r + c) % 97 = 0 THEN 0 ELSE r + c END) AS DOUBLE)
       / CAST(sum(CASE WHEN (r + c) % 97 = 0 THEN 0 ELSE 1 END) AS DOUBLE) AS mean_value
FROM {_DUCK_GRID}
""",
)
def tensor_nanmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean over non-NaN elements (dask/numpy nanmean): exact integer
    (nansum, count) partials, one exact double division at the end —
    bit-identical to the oracle's CASE-filtered ratio."""
    arr = ChunkedArray.from_function(spark, _META, nan_ramp_chunk)
    return arr.nanmean()


@register(
    "tensor_nanminmax",
    extended=True,
    # the %97 pattern NaNs out 0 and the striped multiples; the remaining
    # extremes are closed-form: min = 1 (value 0 is NaN'd), max = the
    # largest r+c not divisible by 97
    oracle=f"""
SELECT CAST(min(CASE WHEN (r + c) % 97 = 0 THEN NULL ELSE r + c END) AS DOUBLE) AS min_value,
       CAST(max(CASE WHEN (r + c) % 97 = 0 THEN NULL ELSE r + c END) AS DOUBLE) AS max_value
FROM {_DUCK_GRID}
""",
)
def tensor_nanminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN-skipping extremes (dask/numpy nanmin/nanmax) over the same
    missing-data ramp as tensor_nansum — the NaN partials null out across
    the Arrow hop and the JVM MIN/MAX skip them, which is exactly the
    wanted semantics here (min/max instead carry the __nan marker to
    PREVENT that skip; the two contracts share one kernel family)."""
    arr = ChunkedArray.from_function(spark, _META, nan_ramp_chunk)
    lo = arr.nanmin().select(F.col("min_value"))
    hi = arr.nanmax().select(F.col("max_value"))
    return lo.crossJoin(hi)


@register(
    "tensor_percentiles",
    extended=True,
    # quantile_cont == numpy linear interpolation; ramp values are ints so
    # the interpolated results are exact dyadic doubles in both engines.
    oracle=f"""
SELECT quantile_cont(CAST(r + c AS DOUBLE), 0.25) AS p25,
       quantile_cont(CAST(r + c AS DOUBLE), 0.50) AS p50,
       quantile_cont(CAST(r + c AS DOUBLE), 0.95) AS p95
FROM {_DUCK_GRID}
""",
)
def tensor_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed percentiles over the chunked array (numpy linear
    interpolation) via iterative histogram refinement
    (plans/chunked.py:percentile): each round is one fused map-side
    1024-bin histogram pass narrowing the value range; only the final
    <= 2^20-element bin is collected. dask's da.percentile is
    approximate for distributed arrays — this is the exact counterpart,
    with cost O(rounds) scans and O(bin) driver memory."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    p25, p50, p95 = arr.percentiles([25.0, 50.0, 95.0])
    return literal_frame(
        spark, [(p25, p50, p95)], "p25 double, p50 double, p95 double"
    )


def _sum3_axis0(a):
    """3-point sum stencil along axis 0 (shape-preserving on the padded
    block; integer-valued sums keep the oracle exact — a /3 moving
    average would reintroduce cross-chunk summation-order rounding)."""
    out = a.copy()
    out[1:-1] = a[:-2] + a[1:-1] + a[2:]
    return out


@register(
    "tensor_map_overlap_sum3",
    extended=True,
    # nearest-boundary 3-point sum along rows of the ramp:
    # s(r,c) = (clamp(r-1)+c) + (r+c) + (clamp(r+1)+c), summed exactly.
    oracle=f"""
SELECT CAST(sum((greatest(r - 1, 0) + c) + (r + c) + (least(r + 1, {_ROWS - 1}) + c))
            AS DOUBLE) AS total
FROM {_DUCK_GRID}
""",
)
def tensor_map_overlap_sum3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask map_overlap as a registered op: a 3-point sum stencil along
    axis 0 with nearest-boundary padding (plans/chunked.py:map_overlap —
    each chunk ships exactly 2 halo planes to its axis neighbors, bodies
    move once), then global sum against the closed-form clamped-index
    oracle."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.map_overlap(_sum3_axis0, depth=1, axis=0, boundary="nearest").sum()


def _pow2_chunk(pos, shape):
    """v(r,c) = 2^(((r+c) mod 3) - 1) ∈ {1/2, 1, 2}: exponents along any
    column prefix stay within ±2, so every cumulative PRODUCT is an exact
    dyadic in [1/4, 4] — float products are exact under ANY association
    order, making the distributed scan bit-comparable cross-engine."""
    base = ramp_chunk(pos, shape)
    return np.power(2.0, np.mod(base, 3.0) - 1.0)


@register(
    "tensor_cumprod_sum",
    extended=True,
    # the oracle forms the same cumulative product as pow(2, running sum
    # of exponents) — a windowed integer sum, then an exact dyadic power
    oracle=f"""
WITH exps AS (
  SELECT r, c, CAST((r + c) % 3 AS INTEGER) - 1 AS e FROM {_DUCK_GRID}
), cp AS (
  SELECT power(2.0, sum(e) OVER (PARTITION BY c ORDER BY r)) AS v FROM exps
)
SELECT CAST(sum(v) AS DOUBLE) AS total FROM cp
""",
)
def tensor_cumprod_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dask ``da.cumprod``: the two-pass distributed scan
    (plans/chunked.py:_axis_scan with ×/1 in place of +/0) over a
    powers-of-two grid whose cumulative products are exact dyadics —
    bit-identical to the oracle's pow(2, windowed exponent sum) under any
    association order. numpy parity on arbitrary values is pytest
    `test_chunked.py::test_axis_cumprod_matches_numpy`."""
    arr = ChunkedArray.from_function(spark, _META, _pow2_chunk)
    return arr.axis_cumprod(axis=0).sum()


@register(
    "tensor_fft_parseval",
    extended=True,
    # Parseval's theorem pins the spectrum's total energy EXACTLY in
    # closed form: sum_k |X_k|^2 = N * sum_n x_n^2 per transformed column.
    # FFT floating error (~1e-12 relative) rules out the bit-hash gate, so
    # this rides the band oracle at a tight 1e-6 — far below any
    # algorithmic mistake, far above IEEE noise.
    band_oracle=f"""
SELECT 'grid' AS name,
       CAST({_GRID[0] * _CHUNK[0]} AS DOUBLE) * sum((r + c) * (r + c)) AS energy
FROM {_DUCK_GRID}
""",
    band_rtol=1e-6,
)
def tensor_fft_parseval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed DFT (dask ``da.fft.fft``, plans/chunked.py:fft): the
    ramp grid transforms along axis 0 (rechunked contiguous — the same
    all-to-all dask requires), the power spectrum |X|^2 stays inside the
    fused per-slab kernel, and the global energy sum is checked against
    Parseval's closed form N*sum(x^2) in DuckDB. numpy cross-check
    (per-element spectrum equality) is pytest `test_fft.py`."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.power_spectrum(axis=0).sum().select(
        F.lit("grid").alias("name"), F.col("total").alias("energy")
    )


@register(
    "tensor_fft_fourstep_parseval",
    extended=True,
    band_oracle=f"""
SELECT 'grid' AS name,
       CAST({_GRID[0] * _CHUNK[0]} AS DOUBLE) * sum((r + c) * (r + c)) AS energy
FROM {_DUCK_GRID}
""",
    band_rtol=1e-6,
)
def tensor_fft_fourstep_parseval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED four-step DFT (r7 verdict ask #4) under the same
    Parseval band gate as `tensor_fft_parseval`: the slab cap is lowered
    below the grid's axis size so ``method='auto'`` routes to the
    transpose algorithm (plans/chunked.py:_fft_four_step — three
    all-to-alls over the verified rechunk/transpose primitives; dask's
    da.fft cannot transform a multi-chunk axis at all), the power
    spectrum fuses into the final stage, and the total energy must equal
    the closed form N·Σx². Per-element numpy parity incl. the hypothesis
    shape sweep is pytest `test_fft.py`."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    # the 256-row transform axis "exceeds" a 1-element slab cap — the
    # honest way to exercise the >slab code path at test scale (the
    # production cap is 64M elements per slab)
    arr._FFT_SLAB_MAX = 1
    return arr.power_spectrum(axis=0).sum().select(
        F.lit("grid").alias("name"), F.col("total").alias("energy")
    )


@register(
    "tensor_staged_roundtrip",
    extended=True,
    oracle=f"SELECT CAST(sum(r + c) AS DOUBLE) AS total FROM {_DUCK_GRID}",
)
def tensor_staged_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-staged ingest plane (sources/staged.py, r6 verdict ask #1)
    under the oracle gate: the ramp grid is written as raw chunk files by
    the producer API (atomic write + sealed-timestep barrier), read back
    through the pure-JVM binaryFile scan + Catalyst path-parse, and
    globally summed — byte-for-byte the DataSource/from_function planes'
    result. Scale path: tools/stream_stress_staged.py measures the same
    pipeline at 512 MiB/timestep (351-406 MiB/s vs the Python DataSource's
    122, BASELINE.md)."""
    import shutil
    import tempfile
    from itertools import product as _product

    from doreisa_spark.sources import staged

    d = tempfile.mkdtemp(prefix="staged_rt_")
    try:
        chunks = {
            pos: ramp_chunk(pos, _META.shape_of(pos))
            for pos in _product(*(range(n) for n in _META.nb_chunks_per_dim))
        }
        staged.write_timestep(d, _META.name, 0, chunks)
        arr = ChunkedArray(staged.read_staged_timestep(spark, d, 0), _META)
        # force the scan NOW (the staging dir is reclaimed in finally; a
        # lazily-returned plan would read deleted files at driver-collect)
        total = arr.sum().first()["total"]
        return literal_frame(spark, [(float(total),)], "total double")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _five_point_sum(a):
    """5-point (von-Neumann) sum stencil — the canonical 2-D Laplacian
    shape for in-situ simulation analytics; integer-valued sums keep the
    oracle exact."""
    out = a.copy()
    out[1:-1, 1:-1] = (
        a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:] + a[1:-1, 1:-1]
    )
    return out


@register(
    "tensor_map_overlap_2d",
    extended=True,
    # nearest-boundary 5-point sum over the ramp: each output element is
    # v(clamp(r-1),c)+v(clamp(r+1),c)+v(r,clamp(c-1))+v(r,clamp(c+1))+v(r,c)
    # with v(r,c)=r+c — closed-form clamped-index oracle, summed exactly.
    oracle=f"""
SELECT CAST(sum(  (greatest(r - 1, 0) + c) + (least(r + 1, {_ROWS - 1}) + c)
                + (r + greatest(c - 1, 0)) + (r + least(c + 1, {_COLS - 1}))
                + (r + c)) AS DOUBLE) AS total
FROM {_DUCK_GRID}
""",
)
def tensor_map_overlap_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-d dask map_overlap (r6 verdict ask #3): a 2-D 5-point sum
    stencil with per-axis depth dict ``{0:1, 1:1}`` and nearest-boundary
    padding (plans/chunked.py:map_overlap — one halo exchange per axis;
    corner halos arrive transitively through the composed passes, the
    dask construction), then global sum vs the closed-form clamped-index
    oracle. tests/test_map_overlap_nd.py checks full numpy parity
    (values, corners, ragged grids, 3-d, all boundary modes)."""
    arr = ChunkedArray.from_function(spark, _META, ramp_chunk)
    return arr.map_overlap(_five_point_sum, depth={0: 1, 1: 1}, boundary="nearest").sum()


@register(
    "tensor_axis_std",
    extended=True,
    # Mirror the ENGINE's expression over the same exact integer sums
    # (max(sumsq/n - mean^2, 0) under one sqrt — the engine clamps
    # rounding-negative variance) — a closed-form variance constant
    # could differ in the last ulp.
    oracle=f"""
SELECT c AS idx,
       round(sqrt(greatest(
                  sum((r + c) * (r + c)) / {float(_GRID[0] * _CHUNK[0])}
                  - (sum(r + c) / {float(_GRID[0] * _CHUNK[0])})
                    * (sum(r + c) / {float(_GRID[0] * _CHUNK[0])}), 0.0)), 6) AS std
FROM {_DUCK_GRID}
GROUP BY c
""",
)
def tensor_axis_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-axis population std (dask ``a.std(axis=0)``): two fused
    axis-sum passes (values and squares — both exact integer partials on
    the ramp) joined on the surviving coordinate, one sqrt per output
    element."""
    df = _ramp(spark, sf_dir).axis_std(axis=0)
    return df.select(
        F.col("coords")[0].cast("bigint").alias("idx"),
        F.round("value", 6).alias("std"),
    )

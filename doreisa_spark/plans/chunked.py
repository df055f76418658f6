"""Distributed N-dimensional arrays as chunk-row DataFrames — the Spark
re-expression of doreisa's core data model.

Reference semantics being mirrored (for parity checking):
- a *chunk* is a dense ndarray at a grid position within
  ``nb_chunks_per_dim`` (reference: doreisa/simulation_node.py:35-56,
  doreisa/_scheduling_actor.py:149-171);
- a *distributed array* is the full chunk grid for one (name, timestep)
  (reference: doreisa/head_node.py:120-164 builds it as a Dask graph);
- dtype/grid metadata is inferred from the first chunks then enforced
  (reference: doreisa/head_node.py:80-100).

Spark design: one DataFrame row per chunk —
``(name string, timestep long, pos array<int>, chunk_shape array<int>,
data array<double>)`` with ``data`` flattened row-major. Rows live
distributed across executors; per-chunk kernels run as Arrow-batched
numpy via mapInPandas (the Pandas-UDF analog of doreisa's per-chunk Dask
tasks); cross-chunk algebra joins on ``pos`` (co-partitioned, so the join
is shuffle-once then local); global reductions are per-chunk partials +
one tiny final aggregate — the same partial/final shape Catalyst gives
relational aggregates.

The driver never materializes array data (`to_numpy` exists for tests
only) — at 100 TB the grid is just a big DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from functools import reduce
from itertools import product
from operator import mul

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = (
    "name string, timestep bigint, pos array<int>, chunk_shape array<int>, data array<double>"
)


@dataclass(frozen=True)
class GridMeta:
    """Frozen grid metadata — the analog of doreisa's per-array registration
    (head_node.py:80-100: dtype + nb_chunks_per_dim + chunk sizes inferred
    from the first chunk, then asserted on every later one)."""

    name: str
    nb_chunks_per_dim: tuple[int, ...]
    chunk_shape: tuple[int, ...]
    dtype: str = "float64"

    @property
    def ndim(self) -> int:
        return len(self.nb_chunks_per_dim)

    @property
    def global_shape(self) -> tuple[int, ...]:
        return tuple(
            n * c for n, c in zip(self.nb_chunks_per_dim, self.chunk_shape)
        )

    @property
    def n_chunks(self) -> int:
        return reduce(mul, self.nb_chunks_per_dim, 1)

    @property
    def chunk_elems(self) -> int:
        return reduce(mul, self.chunk_shape, 1)


class ChunkedArray:
    """A distributed dense array for one (name, timestep): a DataFrame of
    chunk rows plus frozen grid metadata."""

    def __init__(self, df: DataFrame, meta: GridMeta, timestep: int = 0):
        self.df = df
        self.meta = meta
        self.timestep = timestep

    # ------------------------------------------------------------ creation
    @classmethod
    def from_function(
        cls,
        spark: SparkSession,
        meta: GridMeta,
        fn: Callable[[tuple[int, ...], tuple[int, ...]], np.ndarray],
        *,
        timestep: int = 0,
        preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
    ) -> "ChunkedArray":
        """Generate chunks ON THE EXECUTORS from a position→ndarray function.

        Only the chunk positions (a few ints each) leave the driver; the
        data itself is born distributed — the analog of simulation ranks
        producing chunks in place (simulation_node.py:35-74). ``preprocess``
        mirrors the reference's per-chunk ingest callback
        (simulation_node.py:57: applied on the producing node, before
        anything else sees the chunk).
        """
        positions = [list(p) for p in product(*(range(n) for n in meta.nb_chunks_per_dim))]
        pos_df = spark.createDataFrame(
            [(p,) for p in positions], "pos array<int>"
        ).repartition(min(meta.n_chunks, spark.sparkContext.defaultParallelism))

        name, ts, shape = meta.name, timestep, meta.chunk_shape

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for pos in pdf["pos"]:
                    pos_t = tuple(int(x) for x in pos)
                    arr = np.asarray(fn(pos_t, shape), dtype=np.float64)
                    if arr.shape != shape:
                        raise ValueError(f"chunk {pos_t}: shape {arr.shape} != {shape}")
                    if preprocess is not None:
                        arr = np.asarray(preprocess(arr), dtype=np.float64)
                    rows.append(
                        {
                            "name": name,
                            "timestep": ts,
                            "pos": list(pos_t),
                            "chunk_shape": list(shape),
                            "data": arr.ravel(),
                        }
                    )
                yield pd.DataFrame(rows)

        return cls(pos_df.mapInPandas(gen, schema=CHUNK_SCHEMA), meta, ts)

    @classmethod
    def from_numpy_chunks(
        cls,
        spark: SparkSession,
        name: str,
        chunks: dict[tuple[int, ...], np.ndarray],
        *,
        timestep: int = 0,
    ) -> "ChunkedArray":
        """Ingest driver-held chunks (test/small-scale path; the streaming
        ingest in doreisa_spark.streaming is the production analog).

        Grid/dtype inference mirrors head_node.py:80-100: shape grid and
        chunk shape come from the chunks, all chunks must agree."""
        first = next(iter(chunks.values()))
        shape = first.shape
        for p, a in chunks.items():
            if a.shape != shape:
                raise ValueError(f"chunk {p}: irregular shape {a.shape} != {shape}")
        grid = tuple(1 + max(p[d] for p in chunks) for d in range(len(shape)))
        meta = GridMeta(name, grid, shape, str(first.dtype))
        rows = [
            (name, timestep, list(p), list(shape), a.astype(np.float64).ravel().tolist())
            for p, a in chunks.items()
        ]
        return cls(spark.createDataFrame(rows, CHUNK_SCHEMA), meta, timestep)

    # ---------------------------------------------------------- elementwise
    def map_numpy(self, fn: Callable[[np.ndarray], np.ndarray]) -> "ChunkedArray":
        """Per-chunk numpy kernel (Arrow-batched, runs where the chunk
        lives) — the analog of arbitrary Dask blockwise ops on chunks."""
        shape = self.meta.chunk_shape

        def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf.copy()
                out["data"] = [
                    np.asarray(fn(np.asarray(d, dtype=np.float64).reshape(shape)))
                    .astype(np.float64)
                    .ravel()
                    for d in pdf["data"]
                ]
                yield out

        return ChunkedArray(
            self.df.mapInPandas(apply, schema=CHUNK_SCHEMA), self.meta, self.timestep
        )

    def scale(self, k: float) -> "ChunkedArray":
        """Scalar multiply — JVM-side `transform`, no Python at all."""
        return ChunkedArray(
            self.df.withColumn("data", F.expr(f"transform(data, x -> x * CAST({k} AS DOUBLE))")),
            self.meta,
            self.timestep,
        )

    def shift(self, k: float) -> "ChunkedArray":
        return ChunkedArray(
            self.df.withColumn("data", F.expr(f"transform(data, x -> x + CAST({k} AS DOUBLE))")),
            self.meta,
            self.timestep,
        )

    def zip_with(self, other: "ChunkedArray", op: str) -> "ChunkedArray":
        """Elementwise binary op between two same-grid arrays: equi-join on
        chunk position + JVM `zip_with` kernel. One shuffle (none if both
        sides already share partitioning on pos).

        op ∈ {'+', '-', '*', '/'}.
        """
        if self.meta.nb_chunks_per_dim != other.meta.nb_chunks_per_dim:
            raise ValueError("grid mismatch")
        if op not in {"+", "-", "*", "/"}:
            raise ValueError(f"unsupported op {op}")
        a = self.df.select(
            F.col("pos"), F.col("chunk_shape"), F.col("data").alias("__a")
        )
        b = other.df.select(F.col("pos").alias("__bpos"), F.col("data").alias("__b"))
        joined = a.join(b, a["pos"] == b["__bpos"], "inner")
        out = joined.select(
            F.lit(self.meta.name).alias("name"),
            F.lit(self.timestep).cast("bigint").alias("timestep"),
            "pos",
            "chunk_shape",
            F.expr(f"zip_with(__a, __b, (x, y) -> x {op} y)").alias("data"),
        )
        return ChunkedArray(out, self.meta, self.timestep)

    # ----------------------------------------------------------- reductions
    def sum(self) -> DataFrame:
        """Global sum: per-chunk sequential fold (JVM) → final agg.
        One row, column `total` (double)."""
        partial = self.df.select(
            F.expr(
                "aggregate(data, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("__p")
        )
        return partial.agg(F.sum("__p").alias("total"))

    def mean(self) -> DataFrame:
        """Global mean via sum + count partials (never collects data)."""
        partial = self.df.select(
            F.expr("aggregate(data, CAST(0 AS DOUBLE), (acc, x) -> acc + x)").alias("__s"),
            F.size("data").cast("bigint").alias("__n"),
        )
        return partial.agg(
            (F.sum("__s") / F.sum("__n").cast("double")).alias("mean_value")
        )

    def axis_sum(self, axis: int) -> DataFrame:
        """Reduce along one axis of a 2-D grid: per-chunk numpy partial
        reduction → explode to (global_index, partial) → groupBy-sum.

        Output: one row per surviving global index: (idx bigint, total
        double). The shuffle carries only reduced vectors, not chunks."""
        if self.meta.ndim != 2:
            raise NotImplementedError("axis_sum implemented for 2-D grids")
        shape = self.meta.chunk_shape
        keep = 1 - axis
        chunk_len = shape[keep]

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                idx_out: list[int] = []
                val_out: list[float] = []
                for pos, d in zip(pdf["pos"], pdf["data"]):
                    arr = np.asarray(d, dtype=np.float64).reshape(shape)
                    red = arr.sum(axis=axis)
                    base = int(pos[keep]) * chunk_len
                    idx_out.extend(range(base, base + chunk_len))
                    val_out.extend(red.tolist())
                yield pd.DataFrame({"idx": pd.Series(idx_out, dtype="int64"), "partial": val_out})

        partials = self.df.mapInPandas(partial, schema="idx bigint, partial double")
        return partials.groupBy("idx").agg(F.sum("partial").alias("total"))

    # -------------------------------------------------------------- utility
    def persist(self) -> "ChunkedArray":
        """Async materialization analog of doreisa's ray_persist
        (_scheduler.py:114-117): lazy until first action, then cached."""
        return ChunkedArray(self.df.persist(), self.meta, self.timestep)

    def unpersist(self) -> "ChunkedArray":
        self.df.unpersist()
        return self

    def to_numpy(self) -> np.ndarray:
        """TEST-ONLY driver materialization of the full array."""
        out = np.zeros(self.meta.global_shape, dtype=np.float64)
        for row in self.df.collect():
            pos = tuple(row["pos"])
            slices = tuple(
                slice(p * c, (p + 1) * c) for p, c in zip(pos, self.meta.chunk_shape)
            )
            out[slices] = np.asarray(row["data"]).reshape(self.meta.chunk_shape)
        return out

    def count_chunks(self) -> int:
        return self.df.count()


def expected_sum_arithmetic(meta: GridMeta) -> float:
    """Closed-form oracle helper for the r+c test grid (tests use this the
    way the reference uses closed-form sums, tests/test_doreisa.py:18-21)."""
    rows, cols = meta.global_shape
    return float(
        cols * (rows * (rows - 1)) / 2 + rows * (cols * (cols - 1)) / 2
    )


def ramp_chunk(pos: tuple[int, ...], shape: tuple[int, ...]) -> np.ndarray:
    """Standard test chunk: element value = sum of its GLOBAL coordinates
    (for 2-D: A[r, c] = r + c). Deterministic, integer-valued → exact in
    float64 and in any SQL oracle."""
    grids = np.meshgrid(
        *[np.arange(p * s, (p + 1) * s, dtype=np.float64) for p, s in zip(pos, shape)],
        indexing="ij",
    )
    return sum(grids)



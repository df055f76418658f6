"""Distributed N-dimensional arrays as chunk-row DataFrames — the Spark
re-expression of doreisa's core data model.

Reference semantics being mirrored (for parity checking):
- a *chunk* is a dense ndarray at a grid position within
  ``nb_chunks_per_dim`` (reference: doreisa/simulation_node.py:35-56,
  doreisa/_scheduling_actor.py:149-171);
- a *distributed array* is the full chunk grid for one (name, timestep)
  (reference: doreisa/head_node.py:120-164 builds it as a Dask graph);
- dtype/grid metadata is inferred from the first chunks then enforced
  (reference: doreisa/head_node.py:80-100);
- element dtype is preserved end to end (reference: dtype captured at
  head_node.py:84, exercised with int8 in tests/test_dtype.py:17-39);
- chunk sizes may vary per dimension — dask's list-of-lists ``chunks``
  convention (reference: head_node.py:53,157-162).

Spark design: one DataFrame row per chunk —
``(name string, timestep long, pos array<int>, chunk_shape array<int>,
data array<T>)`` with ``data`` flattened row-major and ``T`` the Spark
element type matching the numpy dtype (int8→tinyint … float64→double),
so integer arrays stay exact (int64 sums fold into BIGINT, not a float).
Rows live distributed across executors; per-chunk kernels run as
Arrow-batched numpy via mapInPandas (the Pandas-UDF analog of doreisa's
per-chunk Dask tasks); cross-chunk algebra joins on ``pos``
(co-partitioned, so the join is shuffle-once then local); global
reductions are per-chunk partials + one tiny final aggregate — the same
partial/final shape Catalyst gives relational aggregates. Elementwise
arithmetic on the payload runs JVM-side (``transform``/``zip_with``
inside whole-stage codegen); numpy kernels are reserved for genuine user
callbacks.

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

# numpy dtype name → Spark SQL element type. Unsigned/complex dtypes are
# rejected (Spark has no unsigned integers; silently widening would break
# the reference's exactness contract).
_SPARK_ELEM = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
}


def spark_elem_type(dtype: str) -> str:
    try:
        return _SPARK_ELEM[str(np.dtype(dtype))]
    except KeyError:
        raise TypeError(
            f"unsupported chunk dtype {dtype!r}; supported: {sorted(_SPARK_ELEM)}"
        ) from None


def chunk_schema(dtype: str = "float64") -> str:
    return (
        "name string, timestep bigint, pos array<int>, chunk_shape array<int>, "
        f"data array<{spark_elem_type(dtype)}>"
    )


# float folds accumulate in DOUBLE; integer folds in BIGINT (exact)
def _acc_type(dtype: str) -> str:
    return "DOUBLE" if np.dtype(dtype).kind == "f" else "BIGINT"


def _normalize_chunks(
    nb_chunks_per_dim: tuple[int, ...],
    chunk_shape,
) -> tuple[tuple[int, ...], ...]:
    """Accept a uniform shape tuple (ints) or dask-style per-dimension size
    lists; return the canonical per-dimension size tuples."""
    out = []
    for d, n in enumerate(nb_chunks_per_dim):
        spec = chunk_shape[d]
        if isinstance(spec, (int, np.integer)):
            out.append((int(spec),) * n)
        else:
            sizes = tuple(int(s) for s in spec)
            if len(sizes) != n:
                raise ValueError(
                    f"dim {d}: {len(sizes)} chunk sizes for {n} chunks"
                )
            out.append(sizes)
    return tuple(out)


@dataclass(frozen=True)
class GridMeta:
    """Frozen grid metadata — the analog of doreisa's per-array registration
    (head_node.py:80-100: dtype + nb_chunks_per_dim + chunk sizes inferred
    from the first chunk, then asserted on every later one).

    ``chunk_shape`` accepts either a uniform shape (tuple of ints) or
    dask-style ragged tiling (per-dimension tuples of sizes,
    head_node.py:53,157-162)."""

    name: str
    nb_chunks_per_dim: tuple[int, ...]
    chunk_shape: tuple  # uniform ints or per-dim size tuples
    dtype: str = "float64"

    def __post_init__(self):
        spark_elem_type(self.dtype)  # validate eagerly
        object.__setattr__(
            self, "chunk_shape", tuple(self.chunk_shape)
        )

    @property
    def chunks(self) -> tuple[tuple[int, ...], ...]:
        """Per-dimension chunk size tuples (dask ``chunks`` convention)."""
        return _normalize_chunks(self.nb_chunks_per_dim, self.chunk_shape)

    @property
    def is_uniform(self) -> bool:
        return all(len(set(sizes)) == 1 for sizes in self.chunks)

    def shape_of(self, pos: tuple[int, ...]) -> tuple[int, ...]:
        return tuple(self.chunks[d][p] for d, p in enumerate(pos))

    def offset_of(self, pos: tuple[int, ...]) -> tuple[int, ...]:
        return tuple(sum(self.chunks[d][: p]) for d, p in enumerate(pos))

    @property
    def ndim(self) -> int:
        return len(self.nb_chunks_per_dim)

    @property
    def global_shape(self) -> tuple[int, ...]:
        return tuple(sum(sizes) for sizes in self.chunks)

    @property
    def n_chunks(self) -> int:
        return reduce(mul, self.nb_chunks_per_dim, 1)

    @property
    def schema(self) -> str:
        return chunk_schema(self.dtype)


class ChunkedArray:
    """A distributed dense array for one (name, timestep): a DataFrame of
    chunk rows plus frozen grid metadata."""

    def __init__(self, df: DataFrame, meta: GridMeta, timestep: int = 0):
        self.df = df
        self.meta = meta
        self.timestep = timestep

    # ------------------------------------------------------------ creation
    @classmethod
    def _pos_df(cls, spark: SparkSession, meta: GridMeta) -> DataFrame:
        positions = [list(p) for p in product(*(range(n) for n in meta.nb_chunks_per_dim))]
        return spark.createDataFrame(
            [(p,) for p in positions], "pos array<int>"
        ).repartition(min(meta.n_chunks, spark.sparkContext.defaultParallelism))

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
        name, ts, dtype = meta.name, timestep, np.dtype(meta.dtype)
        shapes = {  # small dict, shipped in the closure
            p: meta.shape_of(p)
            for p in product(*(range(n) for n in meta.nb_chunks_per_dim))
        }

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for pos in pdf["pos"]:
                    pos_t = tuple(int(x) for x in pos)
                    shape = shapes[pos_t]
                    arr = np.asarray(fn(pos_t, shape), dtype=dtype)
                    if arr.shape != shape:
                        raise ValueError(f"chunk {pos_t}: shape {arr.shape} != {shape}")
                    if preprocess is not None:
                        arr = np.asarray(preprocess(arr), dtype=dtype)
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

        return cls(pos_df := cls._pos_df(spark, meta), meta, ts)._replace_df(
            pos_df.mapInPandas(gen, schema=meta.schema)
        )

    def _replace_df(self, df: DataFrame) -> "ChunkedArray":
        return ChunkedArray(df, self.meta, self.timestep)

    @classmethod
    def from_sql_expr(
        cls,
        spark: SparkSession,
        meta: GridMeta,
        value_expr: str,
        *,
        timestep: int = 0,
    ) -> "ChunkedArray":
        """Generate chunks entirely JVM-SIDE from a SQL expression of the
        global coordinates — no Python worker in the pipeline at all, so
        downstream reductions measure tensor throughput, not Arrow/worker
        overhead. ``value_expr`` may reference ``g0..g{ndim-1}`` (global
        coordinates, BIGINT). Requires a uniform grid (the generation
        arithmetic needs constant chunk strides).

        Example: ``from_sql_expr(spark, meta, "g0 + g1")`` builds the test
        ramp A[r, c] = r + c with `sequence`+`transform` inside whole-stage
        codegen.
        """
        if not meta.is_uniform:
            raise ValueError("from_sql_expr requires a uniform grid")
        shape = meta.shape_of((0,) * meta.ndim)
        n_elems = reduce(mul, shape, 1)
        # row-major linear index i → per-dim local coords; + pos*size → global
        strides = []
        acc = 1
        for s in reversed(shape):
            strides.append(acc)
            acc *= s
        strides = list(reversed(strides))  # strides[d] in elements
        coord_defs = ", ".join(
            f"CAST(pos[{d}] AS BIGINT) * {shape[d]} + (i DIV {strides[d]}) % {shape[d]} AS g{d}"
            for d in range(meta.ndim)
        )
        elem = spark_elem_type(meta.dtype)
        data_expr = (
            f"transform(sequence(0, {n_elems - 1}), i -> "
            f"CAST(({_with_coords(value_expr, coord_defs)}) AS {elem}))"
        )
        pos_df = cls._pos_df(spark, meta)
        df = pos_df.select(
            F.lit(meta.name).alias("name"),
            F.lit(timestep).cast("bigint").alias("timestep"),
            "pos",
            F.array(*[F.lit(s) for s in shape]).alias("chunk_shape"),
            F.expr(data_expr).alias("data"),
        )
        return cls(df, meta, timestep)

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

        Grid/dtype/tiling inference mirrors head_node.py:80-100: the grid
        extent comes from the max position per dimension; per-dimension
        chunk sizes come from the chunks themselves and may be ragged, but
        every chunk sharing a grid index along a dimension must agree on
        its size there (dask ``chunks`` consistency)."""
        first = next(iter(chunks.values()))
        dtype = str(first.dtype)
        ndim = first.ndim
        grid = tuple(1 + max(p[d] for p in chunks) for d in range(ndim))
        sizes: list[dict[int, int]] = [dict() for _ in range(ndim)]
        for p, a in chunks.items():
            if str(a.dtype) != dtype:
                raise ValueError(f"chunk {p}: dtype {a.dtype} != {dtype}")
            if a.ndim != ndim:
                raise ValueError(f"chunk {p}: ndim {a.ndim} != {ndim}")
            for d in range(ndim):
                prev = sizes[d].setdefault(p[d], a.shape[d])
                if prev != a.shape[d]:
                    raise ValueError(
                        f"chunk {p}: size {a.shape[d]} along dim {d} "
                        f"conflicts with {prev} at grid index {p[d]}"
                    )
        if len(chunks) != reduce(mul, grid, 1):
            raise ValueError(f"incomplete grid: {len(chunks)} chunks for {grid}")
        tiling = tuple(
            tuple(sizes[d][i] for i in range(grid[d])) for d in range(ndim)
        )
        meta = GridMeta(name, grid, tiling, dtype)
        rows = [
            (name, timestep, list(p), list(a.shape), a.ravel().tolist())
            for p, a in chunks.items()
        ]
        return cls(spark.createDataFrame(rows, meta.schema), meta, timestep)

    # ---------------------------------------------------------- elementwise
    def map_numpy(self, fn: Callable[[np.ndarray], np.ndarray]) -> "ChunkedArray":
        """Per-chunk numpy kernel (Arrow-batched, runs where the chunk
        lives) — the analog of arbitrary Dask blockwise ops on chunks.
        The kernel must preserve shape; dtype is coerced back to the
        array's dtype (matching the reference where preprocess output
        becomes the registered chunk, simulation_node.py:57)."""
        dtype = np.dtype(self.meta.dtype)

        def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pdf.copy()
                out["data"] = [
                    np.asarray(fn(np.asarray(d, dtype=dtype).reshape(tuple(shape))))
                    .astype(dtype)
                    .ravel()
                    for shape, d in zip(pdf["chunk_shape"], pdf["data"])
                ]
                yield out

        return self._replace_df(self.df.mapInPandas(apply, schema=self.meta.schema))

    def _promote(self, k) -> tuple[str, "GridMeta"]:
        """numpy-style dtype promotion for scalar ops."""
        # np.result_type with the raw scalar gives NEP-50 weak promotion
        # (int8 * 10 stays int8; int * 2.5 promotes to float64) — numpy's
        # own semantics, which the reference inherits through dask
        out_dtype = str(np.result_type(np.dtype(self.meta.dtype), k))
        if out_dtype == self.meta.dtype:
            return out_dtype, self.meta
        meta = GridMeta(
            self.meta.name, self.meta.nb_chunks_per_dim, self.meta.chunk_shape, out_dtype
        )
        return out_dtype, meta

    def _scalar_op(self, k, op: str) -> "ChunkedArray":
        out_dtype, meta = self._promote(k)
        elem = spark_elem_type(out_dtype)
        lit = repr(float(k)) if np.dtype(out_dtype).kind == "f" else repr(int(k))
        df = self.df.withColumn(
            "data",
            F.expr(f"transform(data, x -> CAST(x {op} {lit} AS {elem}))"),
        )
        return ChunkedArray(df, meta, self.timestep)

    def scale(self, k) -> "ChunkedArray":
        """Scalar multiply — JVM-side `transform`, no Python at all."""
        return self._scalar_op(k, "*")

    def shift(self, k) -> "ChunkedArray":
        return self._scalar_op(k, "+")

    def zip_with(self, other: "ChunkedArray", op: str) -> "ChunkedArray":
        """Elementwise binary op between two same-grid arrays: equi-join on
        chunk position + JVM `zip_with` kernel. One shuffle (none if both
        sides already share partitioning on pos).

        op ∈ {'+', '-', '*', '/'}; '/' promotes to float64 (numpy true
        division), others follow numpy dtype promotion.
        """
        if self.meta.chunks != other.meta.chunks:
            raise ValueError("grid mismatch")
        if op not in {"+", "-", "*", "/"}:
            raise ValueError(f"unsupported op {op}")
        if op == "/":
            out_dtype = "float64"
        else:
            out_dtype = str(
                np.result_type(np.dtype(self.meta.dtype), np.dtype(other.meta.dtype))
            )
        elem = spark_elem_type(out_dtype)
        meta = GridMeta(
            self.meta.name, self.meta.nb_chunks_per_dim, self.meta.chunk_shape, out_dtype
        )
        a = self.df.select(
            F.col("pos"), F.col("chunk_shape"), F.col("data").alias("__a")
        )
        b = other.df.select(F.col("pos").alias("__bpos"), F.col("data").alias("__b"))
        joined = a.join(b, a["pos"] == b["__bpos"], "inner")
        zip_body = "zip_with(__a, __b, (x, y) -> " + (
            f"CAST(CAST(x AS DOUBLE) {op} CAST(y AS DOUBLE) AS {elem}))"
            if op == "/"
            else f"CAST(x {op} y AS {elem}))"
        )
        out = joined.select(
            F.lit(self.meta.name).alias("name"),
            F.lit(self.timestep).cast("bigint").alias("timestep"),
            "pos",
            "chunk_shape",
            F.expr(zip_body).alias("data"),
        )
        return ChunkedArray(out, meta, self.timestep)

    # ----------------------------------------------------------- reductions
    def sum(self) -> DataFrame:
        """Global sum: per-chunk sequential fold (JVM) → final agg.
        One row, column `total` — BIGINT for integer arrays (exact, the
        reference's int chunks sum exactly), DOUBLE for float arrays."""
        acc = _acc_type(self.meta.dtype)
        partial = self.df.select(
            F.expr(
                f"aggregate(data, CAST(0 AS {acc}), (acc, x) -> acc + x)"
            ).alias("__p")
        )
        return partial.agg(F.sum("__p").cast(acc.lower()).alias("total"))

    def mean(self) -> DataFrame:
        """Global mean via sum + count partials (never collects data)."""
        acc = _acc_type(self.meta.dtype)
        partial = self.df.select(
            F.expr(f"aggregate(data, CAST(0 AS {acc}), (acc, x) -> acc + x)").alias("__s"),
            F.size("data").cast("bigint").alias("__n"),
        )
        return partial.agg(
            (F.sum("__s").cast("double") / F.sum("__n").cast("double")).alias("mean_value")
        )

    def axis_sum(self, axis: int) -> DataFrame:
        """Reduce along one axis of an N-d grid: per-chunk numpy partial
        reduction → explode to (global coords of kept dims, partial) →
        groupBy-sum. The shuffle carries only reduced vectors, not chunks.

        Output: one row per surviving global coordinate:
        ``(coords array<int>, total bigint|double)`` — ``coords`` are the
        global indices of the kept dimensions, in dimension order."""
        ndim = self.meta.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        kept = [d for d in range(ndim) if d != axis]
        dtype = np.dtype(self.meta.dtype)
        np_acc = np.int64 if dtype.kind != "f" else np.float64
        chunks = self.meta.chunks  # for global offsets (ragged-safe)

        def offset(d: int, p: int) -> int:
            return sum(chunks[d][:p])

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                coords_out: list[list[int]] = []
                val_out: list = []
                for pos, shape, d in zip(pdf["pos"], pdf["chunk_shape"], pdf["data"]):
                    shape = tuple(int(s) for s in shape)
                    arr = np.asarray(d, dtype=dtype).reshape(shape)
                    red = arr.sum(axis=axis, dtype=np_acc)
                    kept_shape = red.shape
                    # vectorized global-coordinate construction
                    grids = np.indices(kept_shape).reshape(len(kept), -1)
                    for j, d_ in enumerate(kept):
                        grids[j] += offset(d_, int(pos[d_]))
                    coords_out.extend(grids.T.tolist())
                    val_out.extend(red.ravel().tolist())
                yield pd.DataFrame({"coords": coords_out, "partial": val_out})

        acc_sql = "bigint" if np_acc is np.int64 else "double"
        partials = self.df.mapInPandas(
            partial, schema=f"coords array<int>, partial {acc_sql}"
        )
        return partials.groupBy("coords").agg(
            F.sum("partial").cast(acc_sql).alias("total")
        )

    # -------------------------------------------------------------- utility
    def persist(self) -> "ChunkedArray":
        """Async materialization analog of doreisa's ray_persist
        (_scheduler.py:114-117): lazy until first action, then cached."""
        return self._replace_df(self.df.persist())

    def unpersist(self) -> "ChunkedArray":
        self.df.unpersist()
        return self

    def to_numpy(self) -> np.ndarray:
        """TEST-ONLY driver materialization of the full array."""
        out = np.zeros(self.meta.global_shape, dtype=np.dtype(self.meta.dtype))
        for row in self.df.collect():
            pos = tuple(row["pos"])
            off = self.meta.offset_of(pos)
            shape = tuple(row["chunk_shape"])
            slices = tuple(slice(o, o + s) for o, s in zip(off, shape))
            out[slices] = np.asarray(row["data"], dtype=out.dtype).reshape(shape)
        return out

    def count_chunks(self) -> int:
        return self.df.count()


def _with_coords(value_expr: str, coord_defs: str) -> str:
    """Inline named global-coordinate bindings into a SQL scalar expr via a
    one-row lateral-style struct (works inside lambda scope)."""
    # named_struct is overkill here; simple textual substitution keeps the
    # expression inside the lambda's codegen. coord_defs is "expr AS gN, ..."
    bindings = {}
    for part in _split_top_level(coord_defs):
        expr, alias = part.rsplit(" AS ", 1)
        bindings[alias.strip()] = f"({expr.strip()})"
    out = value_expr
    # longest names first so g10 is not clobbered by g1
    for alias in sorted(bindings, key=len, reverse=True):
        out = out.replace(alias, bindings[alias])
    return out


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


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
    float64 and in any SQL oracle. Uniform grids only (global offset =
    pos * shape); ragged tests build chunks explicitly."""
    grids = np.meshgrid(
        *[np.arange(p * s, (p + 1) * s, dtype=np.float64) for p, s in zip(pos, shape)],
        indexing="ij",
    )
    return sum(grids)

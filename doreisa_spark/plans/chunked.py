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
  convention (reference: head_node.py:53,157-162);
- analytics expressions stay LAZY until compute/persist, and chained
  per-chunk operations fuse into one task (reference: Dask graph built
  lazily, executed once by the scheduler, _scheduler.py:57-125).

Spark design: one DataFrame row per chunk —
``(name string, timestep long, pos array<int>, chunk_shape array<int>,
data binary)`` with ``data`` the raw C-order buffer of the chunk
(``ndarray.tobytes()``; dtype lives in the grid metadata). Rows live
distributed across executors; every numeric kernel runs as Arrow-batched
numpy (``mapInPandas`` / ``applyInPandas``), and elementwise chains FUSE:
an op only appends a numpy closure to the pipeline, and the whole chain
executes in a single Python stage at the next materialization boundary
(reduction, join, persist). Arrays created by ``from_function`` are
*virtual* — only their positions exist as rows — so pipelines like
``generate → preprocess → scale → sum`` ship one double per chunk to the
JVM and the bulk data never crosses a process boundary at all, exactly
like doreisa chunks living their whole life inside one Ray worker.

Why binary payload + numpy, not ``array<double>`` columns + Catalyst
higher-order functions: measured on this container (local[32], 537 MB
grid), ``transform``/``aggregate`` lambdas are interpreted per element
(no whole-stage codegen) and JVM→Arrow serialization of list columns is
per-element too — the HOF pipeline ran 234 s and an array-column numpy
pipeline 53 s, while the fused binary pipeline runs the same reduction in
a few seconds (memcpy across Arrow + vectorized numpy). BinaryType is a
single buffer copy at every boundary. UDF-wise this follows the standard
guidance: Arrow-batched pandas kernels, never row-at-a-time Python.

The driver never materializes array data (`to_numpy` exists for tests
only) — at 100 TB the grid is just a big DataFrame.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from collections import Counter
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from functools import reduce
from itertools import product
from operator import mul

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# numpy dtypes supported end-to-end (reference accepts any numpy dtype,
# head_node.py:84; uint8 volumes are the common HPC/multimodal payload).
# uint8-uint32 sums are exact in int64/BIGINT; uint64 sums are exact via a
# lo/hi 32-bit split per chunk carried as DECIMAL(38,0) (true mathematical
# value — NOT numpy's mod-2^64 wraparound, which no analytics user wants
# from a reduction; dtype-preserving ops like cumsum/diff keep numpy's
# wraparound since they stay in uint64).
# complex64/128 (FFT-adjacent simulation analytics) are stored as their
# native byte layout — every numpy kernel (elementwise, structural,
# matmul/tensordot/einsum block math) handles them natively; only
# reductions whose partials cross the Arrow→JVM hop need pairing: sum/mean
# travel as (re, im) double pairs, ordering reductions (min/max/arg*/
# cumsum/histogram/topk) raise (numpy's lexicographic complex order has no
# SQL analog and no analytics user wants it).
# float16 is INGEST-ONLY: chunks upcast to float32 at the ingest boundary
# (exact widening — every float16 is exactly representable in float32);
# declared metas use float32.
_SUPPORTED = {
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float32", "float64",
    "complex64", "complex128",
}

CHUNK_SCHEMA = (
    "name string, timestep bigint, pos array<int>, chunk_shape array<int>, data binary"
)

# tensordot block cap: 2^24 elements = 128 MB float64 per block — far under
# Arrow's 2 GiB binary-cell limit, big enough that BLAS dominates per block
_TD_MAX_ELEMS = 1 << 24

# from_numpy_chunks: driver-held payloads up to this many bytes plan as a
# LocalRelation (plan-embedded, zero Python-worker scans); larger ones fall
# back to createDataFrame so the plan tree stays small (ADVICE r15)
_LITERAL_PLAN_MAX_BYTES = 64 << 20

# take(): above this many indices the gather plan ships as a joined
# DataFrame instead of a closure-captured dict (ADVICE r5) — ~64k (row,
# slot) int pairs is where per-task closure serialization starts to matter
_TAKE_DISTRIBUTE_AT = 1 << 16

# unique suffix for einsum's internal ones-vector arrays
_EINSUM_ONES_SEQ = 0


def _tile(total: int, block: int) -> tuple[int, ...]:
    """Even ceil-div tiling of ``total`` into blocks of ``block`` (last one
    ragged): the canonical chunk-size sequence used by take/reshape/
    tensordot."""
    block = max(1, min(block, total))
    return tuple(min(block, total - i * block) for i in range((total + block - 1) // block))
POS_SCHEMA = "pos array<int>"


def _check_dtype(dtype: str) -> str:
    s = str(np.dtype(dtype))
    if s == "float16":
        raise TypeError(
            "float16 is ingest-only: chunks upcast to float32 at the ingest "
            "boundary (from_numpy_chunks / Ingest.add_chunk, exact widening) "
            "— declare float32 here"
        )
    if s not in _SUPPORTED:
        raise TypeError(f"unsupported chunk dtype {dtype!r}; supported: {sorted(_SUPPORTED)}")
    return s


# float folds accumulate in float64/DOUBLE; integer folds in int64/BIGINT
# (exact — an int64 sum past 2^53 must not round). uint64 folds cannot fit
# either: sums ride DECIMAL(38,0) (holds ~1e19 elements × 2^64 max value),
# single values (min/max/argmin/argmax) ride DECIMAL(20,0) — both exact.
def _acc(dtype: str, use: str = "sum") -> tuple[np.dtype, str]:
    d = np.dtype(dtype)
    if d.kind == "c":
        raise TypeError(
            "complex arrays support sum()/mean() (paired-double partials) and "
            "all elementwise/structural/matmul ops; ordering-based reductions "
            "(min/max/argmin/argmax/cumsum/histogram/topk) have no SQL analog "
            "for numpy's lexicographic complex order — reduce .real/.imag "
            "components instead"
        )
    if d.kind == "f":
        return np.dtype(np.float64), "double"
    if d == np.uint64:
        return np.dtype(np.uint64), "decimal(38,0)" if use == "sum" else "decimal(20,0)"
    return np.dtype(np.int64), "bigint"


def _exact_u64_sum(arr: np.ndarray, axis: int | None = None):
    """Exact sum of a uint64 array: split each value into 32-bit halves,
    sum each half in uint64 (exact for < 2^32 elements per slab — the 2^31
    slab loop keeps it so at any chunk size), recombine as Python ints.
    Returns an int (axis=None) or an object ndarray of ints."""
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    hi = (arr >> np.uint64(32)).astype(np.uint64)
    if axis is None:
        flat_lo, flat_hi = lo.ravel(), hi.ravel()
        total = 0
        for start in range(0, flat_lo.size, 1 << 31):
            sl = slice(start, start + (1 << 31))
            total += (int(flat_hi[sl].sum(dtype=np.uint64)) << 32) + int(
                flat_lo[sl].sum(dtype=np.uint64)
            )
        return total
    if arr.shape[axis] >= 1 << 32:  # pragma: no cover — 32 GiB+ on one axis
        raise ValueError("axis extent too large for exact uint64 axis sum")
    return (
        (hi.sum(axis=axis, dtype=np.uint64).astype(object) << 32)
        + lo.sum(axis=axis, dtype=np.uint64).astype(object)
    )


def _partial_series(vals: list, np_acc: np.dtype) -> pd.Series:
    """Partial-value transport: uint64 partials go as Python-int objects
    (Arrow maps them onto the declared DECIMAL schema exactly); everything
    else as the native accumulator dtype."""
    if np_acc == np.uint64:
        from decimal import Decimal

        return pd.Series([Decimal(int(v)) for v in vals], dtype=object)
    return pd.Series(vals, dtype=np_acc)


def _nan_aware(np_acc: np.dtype, agg, any_nan):
    """Final-aggregate wrapper enforcing numpy's NaN contract for float
    reductions: the Arrow pandas→JVM hop converts NaN partials to NULL,
    which JVM aggregates silently SKIP — so a NaN chunk would otherwise
    just vanish from the result. ``any_nan`` is the aggregated boolean
    marker emitted Python-side; floats rebuild the NaN, other dtypes (which
    cannot hold NaN) pass through."""
    if np_acc.kind != "f":
        return agg
    return F.when(any_nan, F.lit(float("nan"))).otherwise(agg)


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
                raise ValueError(f"dim {d}: {len(sizes)} chunk sizes for {n} chunks")
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
        _check_dtype(self.dtype)
        object.__setattr__(self, "chunk_shape", tuple(self.chunk_shape))

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
        return tuple(sum(self.chunks[d][:p]) for d, p in enumerate(pos))

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
        return CHUNK_SCHEMA

    def _replaced(self, **kw) -> "GridMeta":
        d = {
            "name": self.name,
            "nb_chunks_per_dim": self.nb_chunks_per_dim,
            "chunk_shape": self.chunk_shape,
            "dtype": self.dtype,
        }
        d.update(kw)
        return GridMeta(**d)


def _decoder(
    gen: Callable | None,
    xform: Callable | None,
    source_dtype: str | None,
    out_dtype: str,
):
    """Build the picklable per-row decode pipeline shared by every Python
    stage: pos (+ raw buffer for materialized arrays) → post-pipeline
    ndarray in the array's logical dtype. This closure captures ONLY numpy
    state, so Spark ships it to executors cheaply."""
    out = np.dtype(out_dtype)
    if gen is not None:

        def rows(pdf: pd.DataFrame):
            for pos in pdf["pos"]:
                p = tuple(int(x) for x in pos)
                yield p, np.asarray(gen(p)).astype(out, copy=False)

        return rows

    src = np.dtype(source_dtype)

    def rows(pdf: pd.DataFrame):
        for pos, shape, buf in zip(pdf["pos"], pdf["chunk_shape"], pdf["data"]):
            p = tuple(int(x) for x in pos)
            arr = np.frombuffer(buf, dtype=src).reshape(tuple(int(s) for s in shape))
            if xform is not None:
                arr = xform(p, arr)
            yield p, np.asarray(arr).astype(out, copy=False)

    return rows


class ChunkedArray:
    """A distributed dense array for one (name, timestep): a DataFrame of
    chunk rows plus frozen grid metadata, with a LAZY per-chunk pipeline.

    Two storage modes:

    - **virtual** (``gen`` set): ``df`` holds only ``pos`` rows; chunks are
      produced on the executors by ``gen(pos)`` when first needed. The
      analog of simulation ranks materializing chunks in place
      (simulation_node.py:35-74).
    - **materialized**: ``df`` holds binary chunk rows; ``xform(pos, arr)``
      is the fused chain of pending per-chunk ops (identity when None).

    ``meta`` always describes the POST-pipeline logical array (dtype after
    promotions, tiling after slicing)."""

    def __init__(
        self,
        df: DataFrame,
        meta: GridMeta,
        timestep: int = 0,
        *,
        gen: Callable[[tuple[int, ...]], np.ndarray] | None = None,
        xform: Callable[[tuple[int, ...], np.ndarray], np.ndarray] | None = None,
        source_dtype: str | None = None,
    ):
        self.df = df
        self.meta = meta
        self.timestep = timestep
        self._gen = gen
        self._xform = xform
        self._source_dtype = source_dtype or meta.dtype

    def _rows_fn(self):
        return _decoder(self._gen, self._xform, self._source_dtype, self.meta.dtype)

    def _derive(self, **kw) -> "ChunkedArray":
        base = dict(
            df=self.df,
            meta=self.meta,
            timestep=self.timestep,
            gen=self._gen,
            xform=self._xform,
            source_dtype=self._source_dtype,
        )
        base.update(kw)
        df = base.pop("df")
        meta = base.pop("meta")
        ts = base.pop("timestep")
        return ChunkedArray(df, meta, ts, **base)

    @property
    def is_virtual(self) -> bool:
        return self._gen is not None

    # ------------------------------------------------------------ creation
    @classmethod
    def _pos_df(cls, spark: SparkSession, meta: GridMeta) -> DataFrame:
        """Chunk-position rows generated ENTIRELY on the executors:
        ``spark.range`` (already split into numPartitions, no shuffle) +
        a JVM row-major id→pos decode. No driver-held list, so a
        billion-chunk grid costs the driver nothing.

        Split count is SCALE-ADAPTIVE (optimization guide §2.2/§6:
        fewer, larger map tasks): sized so each task generates
        ~``spark.doreisa.chunkSplitBytes`` (default 64 MB) of chunk
        data, capped at cluster width. Every task of the fused
        generate→reduce Python stage pays a fixed JVM↔worker round-trip
        (measured ~0.3–1.5 s of summed overhead for 32 tasks over a
        0.5 GB grid vs 8 tasks for the identical result); at large
        grids the cap binds and the stage uses full cluster width, so
        the rule costs nothing at scale. Results are split-count
        independent (the driver re-runs this suite at several core
        counts already)."""
        n = meta.n_chunks
        target = int(spark.conf.get("spark.doreisa.chunkSplitBytes",
                                    str(64 << 20)))
        total_bytes = (reduce(mul, meta.global_shape, 1)
                       * np.dtype(meta.dtype).itemsize)
        by_bytes = -(-total_bytes // max(1, target))
        parts = max(1, min(n, spark.sparkContext.defaultParallelism,
                           by_bytes))
        dims = meta.nb_chunks_per_dim
        strides = [reduce(mul, dims[d + 1 :], 1) for d in range(len(dims))]
        pos = ", ".join(
            f"CAST((id DIV {strides[d]}) % {dims[d]} AS INT)" for d in range(len(dims))
        )
        return spark.range(0, n, 1, parts).selectExpr(f"array({pos}) AS pos")

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
        """A VIRTUAL array: chunks are generated on the executors from a
        position→ndarray function, lazily — only the chunk positions (a few
        ints each) exist as rows until a materialization boundary, and a
        following reduction fuses generation + pipeline + partial-reduce
        into one Python stage (no bulk data ever crosses Arrow).

        ``preprocess`` mirrors the reference's per-chunk ingest callback
        (simulation_node.py:57: applied on the producing node, before
        anything else sees the chunk)."""
        dtype = np.dtype(meta.dtype)
        shapes = {  # small dict, shipped in the closure
            p: meta.shape_of(p) for p in product(*(range(n) for n in meta.nb_chunks_per_dim))
        }

        def gen(pos: tuple[int, ...]) -> np.ndarray:
            shape = shapes[pos]
            arr = np.asarray(fn(pos, shape), dtype=dtype)
            if arr.shape != shape:
                raise ValueError(f"chunk {pos}: shape {arr.shape} != {shape}")
            if preprocess is not None:
                arr = np.asarray(preprocess(arr), dtype=dtype)
            return arr

        return cls(cls._pos_df(spark, meta), meta, timestep, gen=gen)

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
        if first.dtype == np.float16:
            # documented precision contract: exact widening (every float16
            # value is exactly representable in float32); the frozen meta
            # declares float32
            chunks = {p: a.astype(np.float32) for p, a in chunks.items()}
            first = next(iter(chunks.values()))
        dtype = _check_dtype(str(first.dtype))
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
        tiling = tuple(tuple(sizes[d][i] for i in range(grid[d])) for d in range(ndim))
        meta = GridMeta(name, grid, tiling, dtype)
        rows = [
            (name, timestep, list(p), list(a.shape), np.ascontiguousarray(a).tobytes())
            for p, a in chunks.items()
        ]
        # LocalRelation, not a pickled Python RDD: createDataFrame(rows)
        # planned every scan of the chunk frame as default.parallelism
        # Python-worker tasks deserializing a handful of rows (guide §4 —
        # the same waste operators/literal.py removes for dims/LUTs).
        # A LocalRelation is single-partition, which would serialize the
        # downstream per-chunk Python compute, so re-spread the chunk ROWS
        # (driver-held and small by this constructor's contract) across at
        # most one task per chunk — the exchange moves exactly the bytes
        # that must reach the workers anyway.
        from doreisa_spark.operators.literal import literal_frame

        # Size guard (ADVICE r15): a LocalRelation embeds the raw chunk
        # bytes IN the logical plan, which the optimizer copies and
        # stringifies on every action — fine for the small driver-held
        # grids this constructor is for, pathological for a caller who
        # hands it 100s of MB. Above the cap, take the classic
        # createDataFrame path (pickled rows; heavier per scan but the
        # payload stays out of the plan tree).
        payload_bytes = sum(len(r[4]) for r in rows)
        if payload_bytes <= _LITERAL_PLAN_MAX_BYTES:
            df = literal_frame(spark, rows, CHUNK_SCHEMA)
        else:
            df = spark.createDataFrame(rows, CHUNK_SCHEMA)
        width = min(len(rows), spark.sparkContext.defaultParallelism)
        if width > 1:
            df = df.repartition(width)
        return cls(df, meta, timestep)

    # -------------------------------------------------------- materialization
    def materialize(self) -> "ChunkedArray":
        """Flush the pending pipeline into binary chunk rows (one fused
        Python stage). No-op if nothing is pending."""
        if self._gen is None and self._xform is None:
            return self
        rows_fn = self._rows_fn()
        name, ts = self.meta.name, self.timestep

        def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, arr in rows_fn(pdf):
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(arr.shape))
                    out["data"].append(arr.tobytes())
                yield pd.DataFrame(out)

        df = self.df.mapInPandas(emit, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, self.meta, ts)

    # ---------------------------------------------------------- elementwise
    def map_numpy(self, fn: Callable[[np.ndarray], np.ndarray]) -> "ChunkedArray":
        """Per-chunk numpy kernel — the analog of arbitrary Dask blockwise
        ops. LAZY: appends to the fused pipeline; dtype is coerced back to
        the array's dtype (matching the reference where preprocess output
        becomes the registered chunk, simulation_node.py:57)."""
        return self._compose(lambda pos, arr: fn(arr))

    def _compose(self, step: Callable, new_meta: GridMeta | None = None) -> "ChunkedArray":
        meta = new_meta or self.meta
        if self._gen is not None:
            g = self._gen
            return self._derive(meta=meta, gen=lambda pos: step(pos, g(pos)))
        xf = self._xform
        if xf is None:
            return self._derive(meta=meta, xform=step)
        return self._derive(meta=meta, xform=lambda pos, arr: step(pos, xf(pos, arr)))

    def _scalar_op(self, k, op: str) -> "ChunkedArray":
        # np.result_type with the raw scalar gives NEP-50 weak promotion
        # (int8 * 10 stays int8; int * 2.5 promotes to float64) — numpy's
        # own semantics, which the reference inherits through dask
        out_dtype = _check_dtype(str(np.result_type(np.dtype(self.meta.dtype), k)))
        fn = {
            "*": lambda pos, a: a * k,
            "+": lambda pos, a: a + k,
        }[op]
        return self._compose(fn, self.meta._replaced(dtype=out_dtype))

    def scale(self, k) -> "ChunkedArray":
        """Scalar multiply — lazy, fused into the chunk pipeline."""
        return self._scalar_op(k, "*")

    def shift(self, k) -> "ChunkedArray":
        return self._scalar_op(k, "+")

    _UFUNCS = {
        "abs": "abs",
        "negative": "negative",
        "sqrt": "sqrt",
        "exp": "exp",
        "log": "log",
        "log1p": "log1p",
        "square": "square",
    }

    def ufunc(self, name: str) -> "ChunkedArray":
        """Named elementwise ufunc (dask ``da.sqrt(a)`` etc.), LAZY in the
        fused pipeline. Output dtype follows numpy promotion, except that
        a result dtype outside the supported set (e.g. numpy's float16
        for sqrt(uint8)) computes and stores in float64 instead."""
        if name not in self._UFUNCS:
            raise ValueError(f"unsupported ufunc {name!r}; supported: {sorted(self._UFUNCS)}")
        fn = getattr(np, self._UFUNCS[name])
        probe = str(fn(np.empty(0, dtype=self.meta.dtype)).dtype)
        if probe in _SUPPORTED:
            step = lambda pos, arr: fn(arr)  # noqa: E731
            out_dtype = probe
        else:
            step = lambda pos, arr: fn(arr.astype(np.float64))  # noqa: E731
            out_dtype = "float64"
        return self._compose(step, self.meta._replaced(dtype=out_dtype))

    def abs(self) -> "ChunkedArray":
        return self.ufunc("abs")

    def clip(self, lo, hi) -> "ChunkedArray":
        """Elementwise clamp to [lo, hi] — dtype-preserving (the uint8
        image-range clamp of a multimodal pipeline)."""
        return self._compose(lambda pos, arr: np.clip(arr, lo, hi))

    def coarsen(self, reduction: str, factors: dict[int, int]) -> "ChunkedArray":
        """dask.array.coarsen parity: block-reduce by integer ``factors``
        per axis (``{0: 2, 1: 2}`` halves both axes by 2x2-block
        ``reduction`` — mean/sum/max/min). The downsampling step in-situ
        simulation analytics applies before visualization or storage.

        Every chunk size along a coarsened axis must be divisible by its
        factor (dask's trim_excess=False contract) — the blocks then never
        straddle chunk boundaries and the whole op is one LAZY per-chunk
        numpy reshape+reduce fused into the chunk pipeline: zero shuffle,
        zero halo exchange, output chunk grid = same grid with chunk
        sizes divided. ``rechunk`` first for non-divisible tilings."""
        red = {"mean": np.mean, "sum": np.sum, "max": np.max, "min": np.min}[
            reduction
        ]
        chunks = self.meta.chunks
        nd = len(chunks)
        fs = tuple(int(factors.get(d, 1)) for d in range(nd))
        if any(f < 1 for f in fs):
            raise ValueError(f"factors must be >= 1, got {factors}")
        for d, f in enumerate(fs):
            for s in chunks[d]:
                if s % f:
                    raise ValueError(
                        f"chunk size {s} on axis {d} not divisible by "
                        f"factor {f}; rechunk first (dask coarsen "
                        "trim_excess=False contract)"
                    )
        probe = str(red(np.ones((1,) * nd, dtype=self.meta.dtype)).dtype)
        out_dtype = probe if probe in _SUPPORTED else "float64"
        new_chunks = tuple(
            tuple(s // f for s in sizes) for sizes, f in zip(chunks, fs)
        )
        new_meta = GridMeta(
            self.meta.name, self.meta.nb_chunks_per_dim, new_chunks, dtype=out_dtype
        )
        axes = tuple(range(1, 2 * nd, 2))

        def step(pos, arr):
            shape = []
            for s, f in zip(arr.shape, fs):
                shape += [s // f, f]
            return red(arr.reshape(shape), axis=axes)

        return self._compose(step, new_meta)

    def scale_axis(self, vec, axis: int) -> "ChunkedArray":
        """Broadcast-multiply along one axis by a driver-held 1-D vector —
        the tensor analog of a broadcast join (dask ``A * v`` with
        broadcasting). ``A.scale_axis(v, 1).axis_sum(1)`` is the
        distributed matrix-vector product.

        The vector ships inside the fused closure (small by contract, like
        the ANN query set); each chunk multiplies by its own slice, LAZY
        and map-only — zero shuffles, composing with the pipeline."""
        v = np.asarray(vec)
        if v.ndim != 1:
            raise ValueError("scale_axis expects a 1-D vector")
        if not (0 <= axis < self.meta.ndim):
            raise ValueError(f"axis {axis} out of range for ndim {self.meta.ndim}")
        if len(v) != self.meta.global_shape[axis]:
            raise ValueError(
                f"vector length {len(v)} != axis extent {self.meta.global_shape[axis]}"
            )
        out_dtype = _check_dtype(str(np.result_type(np.dtype(self.meta.dtype), v.dtype)))
        starts = [0]
        for s in self.meta.chunks[axis][:-1]:
            starts.append(starts[-1] + s)
        out_np = np.dtype(out_dtype)

        def step(pos, arr):
            k = pos[axis]
            seg = v[starts[k] : starts[k] + arr.shape[axis]]
            shape = [1] * arr.ndim
            shape[axis] = -1
            return (arr * seg.reshape(shape)).astype(out_np, copy=False)

        return self._compose(step, self.meta._replaced(dtype=out_dtype))

    def astype(self, dtype) -> "ChunkedArray":
        """Dtype conversion (dask ``.astype``), lazy in the pipeline."""
        s = _check_dtype(dtype)
        if s == self.meta.dtype:
            return self
        return self._compose(
            lambda pos, arr: arr.astype(s, copy=False),
            self.meta._replaced(dtype=s),
        )

    def zip_with(self, other: "ChunkedArray", op: str) -> "ChunkedArray":
        """Elementwise binary op between two same-grid arrays.

        Fast path: when BOTH sides are virtual (same grid), the result is
        virtual too — the op composes into one generation closure, zero
        shuffles (the Dask-style operator-fusion rewrite SURVEY §4 scoped).
        Otherwise: materialize both sides, equi-join the binary rows on
        chunk position (one shuffle; none if co-partitioned), and combine
        in an Arrow-batched numpy kernel.

        op ∈ {'+', '-', '*', '/', 'max', 'min'}; '/' promotes to float64
        (numpy true division), others follow numpy dtype promotion.
        """
        if self.meta.chunks != other.meta.chunks:
            raise ValueError("grid mismatch")
        ops = {
            "+": np.add,
            "-": np.subtract,
            "*": np.multiply,
            "/": np.true_divide,
            "max": np.maximum,
            "min": np.minimum,
        }
        if op not in ops:
            raise ValueError(f"unsupported op {op}")
        np_op = ops[op]
        if op == "/":
            out_dtype = "float64"
        else:
            out_dtype = _check_dtype(
                str(np.result_type(np.dtype(self.meta.dtype), np.dtype(other.meta.dtype)))
            )
        meta = self.meta._replaced(dtype=out_dtype)
        out_np = np.dtype(out_dtype)

        if self._gen is not None and other._gen is not None:
            ga, gb = self._gen, other._gen  # virtual-virtual: fuse, zero shuffles
            return ChunkedArray(
                self.df,
                meta,
                self.timestep,
                gen=lambda pos: np_op(ga(pos), gb(pos)).astype(out_np, copy=False),
            )

        a = self.materialize().df.select(
            "pos", F.col("chunk_shape").alias("sh"), F.col("data").alias("__a")
        )
        b = other.materialize().df.select(
            F.col("pos").alias("__bpos"), F.col("data").alias("__b")
        )
        joined = a.join(b, a["pos"] == b["__bpos"], "inner")
        name, ts = self.meta.name, self.timestep
        dt_a, dt_b = np.dtype(self.meta.dtype), np.dtype(other.meta.dtype)

        def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, sh, ba, bb in zip(pdf["pos"], pdf["sh"], pdf["__a"], pdf["__b"]):
                    shape = tuple(int(s) for s in sh)
                    va = np.frombuffer(ba, dtype=dt_a).reshape(shape)
                    vb = np.frombuffer(bb, dtype=dt_b).reshape(shape)
                    res = np_op(va, vb).astype(out_np, copy=False)
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(shape))
                    out["data"].append(res.tobytes())
                yield pd.DataFrame(out)

        df = joined.mapInPandas(combine, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def maximum(self, other: "ChunkedArray") -> "ChunkedArray":
        """Elementwise max of two same-grid arrays (dask ``da.maximum``)."""
        return self.zip_with(other, "max")

    def minimum(self, other: "ChunkedArray") -> "ChunkedArray":
        """Elementwise min of two same-grid arrays (dask ``da.minimum``)."""
        return self.zip_with(other, "min")

    def where(self, cond: "ChunkedArray", other: "ChunkedArray") -> "ChunkedArray":
        """Ternary select (dask ``da.where(cond, self, other)``): element
        from ``self`` where ``cond`` is nonzero, else from ``other``.

        All-virtual inputs fuse into one generation closure (zero
        shuffles); otherwise the three chunk frames equi-join on position
        (one shuffle each when not co-partitioned) and a single Arrow
        kernel applies ``np.where`` — the same join-then-kernel plan as
        zip_with, widened to three sides. NaN-safe: unselected lanes are
        never arithmetically combined (unlike a mask-multiply encoding)."""
        if self.meta.chunks != cond.meta.chunks or self.meta.chunks != other.meta.chunks:
            raise ValueError("grid mismatch")
        out_dtype = _check_dtype(
            str(np.result_type(np.dtype(self.meta.dtype), np.dtype(other.meta.dtype)))
        )
        meta = self.meta._replaced(dtype=out_dtype)
        out_np = np.dtype(out_dtype)

        if self._gen is not None and cond._gen is not None and other._gen is not None:
            ga, gc, gb = self._gen, cond._gen, other._gen
            return ChunkedArray(
                self.df,
                meta,
                self.timestep,
                gen=lambda pos: np.where(gc(pos) != 0, ga(pos), gb(pos)).astype(
                    out_np, copy=False
                ),
            )

        a = self.materialize().df.select(
            "pos", F.col("chunk_shape").alias("sh"), F.col("data").alias("__a")
        )
        c = cond.materialize().df.select(
            F.col("pos").alias("__cpos"), F.col("data").alias("__c")
        )
        b = other.materialize().df.select(
            F.col("pos").alias("__bpos"), F.col("data").alias("__b")
        )
        joined = a.join(c, a["pos"] == c["__cpos"]).join(b, a["pos"] == b["__bpos"])
        name, ts = self.meta.name, self.timestep
        dt_a = np.dtype(self.meta.dtype)
        dt_c = np.dtype(cond.meta.dtype)
        dt_b = np.dtype(other.meta.dtype)

        def combine3(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, sh, ba, bc, bb in zip(
                    pdf["pos"], pdf["sh"], pdf["__a"], pdf["__c"], pdf["__b"]
                ):
                    shape = tuple(int(s) for s in sh)
                    va = np.frombuffer(ba, dtype=dt_a).reshape(shape)
                    vc = np.frombuffer(bc, dtype=dt_c).reshape(shape)
                    vb = np.frombuffer(bb, dtype=dt_b).reshape(shape)
                    res = np.where(vc != 0, va, vb).astype(out_np, copy=False)
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(shape))
                    out["data"].append(res.tobytes())
                yield pd.DataFrame(out)

        df = joined.mapInPandas(combine3, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    # -------------------------------------------------- structural operators
    def slice(self, region: "tuple[tuple[int | None, int | None], ...]") -> "ChunkedArray":
        """Region selection ``arr[a0:b0, a1:b1, ...]`` — the tensor analog of
        partition pruning + filter pushdown:

        1. chunks wholly outside the region are PRUNED by a Catalyst filter
           on ``pos`` (never generated/read at scale);
        2. boundary trimming is a LAZY numpy view composed into the fused
           pipeline (a contiguous sub-box of a row-major chunk is just a
           slice — no re-layout).

        Reference parity: user callbacks index assembled arrays
        (tests/test_sliding_window.py:27); dask's ``array[slices]`` is the
        API being mirrored."""
        chunks = self.meta.chunks
        ndim = self.meta.ndim
        if len(region) != ndim:
            raise ValueError(f"region has {len(region)} dims, array has {ndim}")
        gshape = self.meta.global_shape
        bounds = []
        for d, (a, b) in enumerate(region):
            a = 0 if a is None else int(a)
            b = gshape[d] if b is None else int(b)
            if not (0 <= a < b <= gshape[d]):
                raise ValueError(f"dim {d}: empty or out-of-range slice [{a}, {b})")
            bounds.append((a, b))
        offs = [np.concatenate([[0], np.cumsum(chunks[d])]).astype(int) for d in range(ndim)]
        lo_idx, hi_idx, new_sizes = [], [], []
        for d, (a, b) in enumerate(bounds):
            lo = int(np.searchsorted(offs[d], a, side="right") - 1)
            hi = int(np.searchsorted(offs[d], b, side="left") - 1)
            lo_idx.append(lo)
            hi_idx.append(hi)
            new_sizes.append(
                tuple(
                    min(b, int(offs[d][p + 1])) - max(a, int(offs[d][p]))
                    for p in range(lo, hi + 1)
                )
            )
        pruned = self.df
        for d in range(ndim):
            pruned = pruned.where(
                (F.col("pos")[d] >= lo_idx[d]) & (F.col("pos")[d] <= hi_idx[d])
            )
        # rebase pos to the new grid (JVM select keeps every other column)
        rebased = pruned.withColumn(
            "pos", F.expr("array(" + ", ".join(f"pos[{d}] - {lo_idx[d]}" for d in range(ndim)) + ")")
        )
        lo_t, bounds_t = tuple(lo_idx), tuple(bounds)
        offs_t = tuple(tuple(int(x) for x in o) for o in offs)

        def trim(pos: tuple[int, ...], arr: np.ndarray) -> np.ndarray:
            sel = []
            for d in range(len(pos)):
                orig = pos[d] + lo_t[d]
                base = offs_t[d][orig]
                sel.append(
                    slice(
                        max(bounds_t[d][0] - base, 0),
                        min(bounds_t[d][1] - base, arr.shape[d]),
                    )
                )
            return arr[tuple(sel)]

        meta = self.meta._replaced(
            nb_chunks_per_dim=tuple(h - l + 1 for l, h in zip(lo_idx, hi_idx)),
            chunk_shape=tuple(new_sizes),
        )
        # compose on the ORIGINAL pipeline, translating new pos → old pos
        if self._gen is not None:
            g = self._gen
            gen2 = lambda pos: trim(pos, g(tuple(p + l for p, l in zip(pos, lo_t))))  # noqa: E731
            return ChunkedArray(rebased, meta, self.timestep, gen=gen2)
        xf = self._xform
        if xf is None:
            xform2 = trim
        else:
            xform2 = lambda pos, arr: trim(  # noqa: E731
                pos, xf(tuple(p + l for p, l in zip(pos, lo_t)), arr)
            )
        return ChunkedArray(
            rebased,
            meta,
            self.timestep,
            xform=xform2,
            source_dtype=self._source_dtype,
        )

    @staticmethod
    def stack(arrays: "list[ChunkedArray]") -> "ChunkedArray":
        """dask.array.stack analog: N same-grid arrays → one array with a new
        leading axis of extent N (one chunk per slot). Pure union + pos
        prefix — no shuffle. All-virtual inputs stay virtual."""
        if not arrays:
            raise ValueError("stack of nothing")
        base = arrays[0].meta
        for a in arrays[1:]:
            if a.meta.chunks != base.chunks:
                raise ValueError("grid mismatch")
            if a.meta.dtype != base.dtype:
                raise ValueError("dtype mismatch")
        meta = GridMeta(
            base.name,
            (len(arrays),) + base.nb_chunks_per_dim,
            ((1,) * len(arrays),) + base.chunks,
            base.dtype,
        )
        ts = arrays[0].timestep
        if all(a._gen is not None for a in arrays):
            gens = [a._gen for a in arrays]
            parts = [
                a.df.select(F.expr(f"array({i}) || pos").alias("pos"))
                for i, a in enumerate(arrays)
            ]
            df = reduce(DataFrame.unionAll, parts)
            gen = lambda pos: np.expand_dims(gens[pos[0]](tuple(pos[1:])), 0)  # noqa: E731
            return ChunkedArray(df, meta, ts, gen=gen)
        parts = [
            a.materialize().df.select(
                "name",
                "timestep",
                F.expr(f"array({i}) || pos").alias("pos"),
                F.expr("array(1) || chunk_shape").cast("array<int>").alias("chunk_shape"),
                "data",
            )
            for i, a in enumerate(arrays)
        ]
        df = reduce(DataFrame.unionAll, parts)
        return ChunkedArray(df, meta, ts)

    def transpose(self, axes: "tuple[int, ...] | None" = None) -> "ChunkedArray":
        """dask.array.transpose analog: permute the array's dimensions.

        MAP-ONLY — no shuffle: the chunk grid permutes with the axes, so
        each chunk's new position is a JVM array reorder of ``pos`` and
        the payload permutation is a lazy numpy ``transpose`` composed
        into the fused pipeline (a view until the next materialization).
        """
        ndim = self.meta.ndim
        perm = tuple(range(ndim))[::-1] if axes is None else tuple(int(a) for a in axes)
        if sorted(perm) != list(range(ndim)):
            raise ValueError(f"axes {perm} is not a permutation of 0..{ndim - 1}")
        if perm == tuple(range(ndim)):
            return self
        inv = [0] * ndim
        for d, p in enumerate(perm):
            inv[p] = d
        inv_t = tuple(inv)
        permuted = self.df.withColumn(
            "pos", F.expr("array(" + ", ".join(f"pos[{p}]" for p in perm) + ")")
        )
        meta = self.meta._replaced(
            nb_chunks_per_dim=tuple(self.meta.nb_chunks_per_dim[p] for p in perm),
            chunk_shape=tuple(self.meta.chunks[p] for p in perm),
        )
        # compose on the ORIGINAL pipeline, translating new pos → old pos
        if self._gen is not None:
            g = self._gen
            gen2 = lambda pos: g(tuple(pos[d] for d in inv_t)).transpose(perm)  # noqa: E731
            return ChunkedArray(permuted, meta, self.timestep, gen=gen2)
        xf = self._xform
        if xf is None:
            xform2 = lambda pos, arr: arr.transpose(perm)  # noqa: E731
        else:
            xform2 = lambda pos, arr: xf(  # noqa: E731
                tuple(pos[d] for d in inv_t), arr
            ).transpose(perm)
        return ChunkedArray(
            permuted,
            meta,
            self.timestep,
            xform=xform2,
            source_dtype=self._source_dtype,
        )

    @staticmethod
    def concatenate(arrays: "list[ChunkedArray]", axis: int = 0) -> "ChunkedArray":
        """dask.array.concatenate analog: join arrays along an EXISTING
        axis (``stack`` adds a new one). Pure union + pos shift on the
        concat axis — no shuffle, no payload movement; all-virtual inputs
        stay virtual. Tilings must agree on every other axis (the concat
        axis may be ragged across inputs)."""
        if not arrays:
            raise ValueError("concatenate of nothing")
        base = arrays[0].meta
        ndim = base.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        for a in arrays[1:]:
            if a.meta.dtype != base.dtype:
                raise ValueError("dtype mismatch")
            for d in range(ndim):
                if d != axis and a.meta.chunks[d] != base.chunks[d]:
                    raise ValueError(f"tiling mismatch on dim {d}")
        counts = [a.meta.nb_chunks_per_dim[axis] for a in arrays]
        starts = tuple(int(s) for s in np.concatenate([[0], np.cumsum(counts)])[:-1])
        meta = base._replaced(
            nb_chunks_per_dim=base.nb_chunks_per_dim[:axis]
            + (sum(counts),)
            + base.nb_chunks_per_dim[axis + 1 :],
            chunk_shape=base.chunks[:axis]
            + (tuple(c for a in arrays for c in a.meta.chunks[axis]),)
            + base.chunks[axis + 1 :],
        )
        ts = arrays[0].timestep

        def shifted(df: DataFrame, off: int) -> DataFrame:
            if off == 0:
                return df
            expr = ", ".join(
                f"pos[{d}] + {off}" if d == axis else f"pos[{d}]" for d in range(ndim)
            )
            return df.withColumn("pos", F.expr(f"array({expr})"))

        if all(a._gen is not None for a in arrays):
            gens = [a._gen for a in arrays]
            df = reduce(
                DataFrame.unionAll,
                [shifted(a.df.select("pos"), starts[i]) for i, a in enumerate(arrays)],
            )

            def gen(pos: tuple[int, ...]) -> np.ndarray:
                i = bisect_right(starts, pos[axis]) - 1
                local = pos[:axis] + (pos[axis] - starts[i],) + pos[axis + 1 :]
                return gens[i](local)

            return ChunkedArray(df, meta, ts, gen=gen)
        df = reduce(
            DataFrame.unionAll,
            [
                shifted(
                    a.materialize().df.select(
                        "name", "timestep", "pos", "chunk_shape", "data"
                    ),
                    starts[i],
                )
                for i, a in enumerate(arrays)
            ],
        )
        return ChunkedArray(df, meta, ts)

    def rechunk(self, new_chunks) -> "ChunkedArray":
        """Re-tile the array to a new chunk decomposition (dask
        ``rechunk``). One fused Python stage splits every source chunk into
        the sub-blocks that land in each target chunk; one groupBy shuffle
        brings each target's pieces together; applyInPandas assembles.
        The shuffle moves each element exactly once — the minimum any
        repartitioning can do."""
        meta = self._rechunk_meta(new_chunks)
        if meta.global_shape != self.meta.global_shape:
            raise ValueError(
                f"rechunk changes global shape {self.meta.global_shape} -> "
                f"{meta.global_shape}"
            )
        ndim = self.meta.ndim
        dtype = np.dtype(self.meta.dtype)
        src_offs = [
            np.concatenate([[0], np.cumsum(self.meta.chunks[d])]).astype(int)
            for d in range(ndim)
        ]
        dst_offs = [
            np.concatenate([[0], np.cumsum(meta.chunks[d])]).astype(int) for d in range(ndim)
        ]
        rows_fn = self._rows_fn()

        def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"pos": [], "piece_off": [], "piece_shape": [], "piece": []}
                for pos, arr in rows_fn(pdf):
                    g0 = [int(src_offs[d][pos[d]]) for d in range(ndim)]
                    windows = []
                    for d in range(ndim):
                        a, b = g0[d], g0[d] + arr.shape[d]
                        lo = int(np.searchsorted(dst_offs[d], a, side="right") - 1)
                        hi = int(np.searchsorted(dst_offs[d], b, side="left") - 1)
                        windows.append(range(lo, hi + 1))
                    for tgt in product(*windows):
                        loc = tuple(
                            slice(
                                max(int(dst_offs[d][tgt[d]]), g0[d]) - g0[d],
                                min(int(dst_offs[d][tgt[d] + 1]), g0[d] + arr.shape[d])
                                - g0[d],
                            )
                            for d in range(ndim)
                        )
                        sub = np.ascontiguousarray(arr[loc])
                        place = [
                            max(int(dst_offs[d][tgt[d]]), g0[d]) - int(dst_offs[d][tgt[d]])
                            for d in range(ndim)
                        ]
                        out["pos"].append(list(tgt))
                        out["piece_off"].append(place)
                        out["piece_shape"].append(list(sub.shape))
                        out["piece"].append(sub.tobytes())
                yield pd.DataFrame(out)

        pieces = self.df.mapInPandas(
            split,
            schema="pos array<int>, piece_off array<int>, piece_shape array<int>, piece binary",
        )
        name, ts = self.meta.name, self.timestep
        shape_of = {
            p: meta.shape_of(p)
            for p in product(*(range(n) for n in meta.nb_chunks_per_dim))
        }

        def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pos = tuple(int(x) for x in key[0])
            tgt = np.zeros(shape_of[pos], dtype=dtype)
            for off, shp, piece in zip(pdf["piece_off"], pdf["piece_shape"], pdf["piece"]):
                shape = tuple(int(s) for s in shp)
                loc = tuple(slice(int(o), int(o) + s) for o, s in zip(off, shape))
                tgt[loc] = np.frombuffer(piece, dtype=dtype).reshape(shape)
            return pd.DataFrame(
                {
                    "name": [name],
                    "timestep": [ts],
                    "pos": [list(pos)],
                    "chunk_shape": [list(tgt.shape)],
                    "data": [tgt.tobytes()],
                }
            )

        df = pieces.groupBy("pos").applyInPandas(assemble, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def _rechunk_meta(self, new_chunks) -> GridMeta:
        """Normalize a rechunk spec (uniform ints or per-dim size lists) to
        a GridMeta covering this array's global shape."""
        gshape = self.meta.global_shape
        grid, tiling = [], []
        for d, spec in enumerate(new_chunks):
            if isinstance(spec, (int, np.integer)):
                s = int(spec)
                n = (gshape[d] + s - 1) // s
                sizes = tuple(min(s, gshape[d] - i * s) for i in range(n))
            else:
                sizes = tuple(int(x) for x in spec)
            grid.append(len(sizes))
            tiling.append(sizes)
        return GridMeta(self.meta.name, tuple(grid), tuple(tiling), self.meta.dtype)

    def matmul(self, other: "ChunkedArray") -> "ChunkedArray":
        """Distributed block matrix multiply (dask ``a @ b``) for 2-D
        arrays. Classic SUMMA-style plan, all standard Spark primitives:

        - equi-join the chunk grids on the contracted index k
          (A[i,k] ⨝ B[k,j] — Catalyst picks broadcast when one side is
          small);
        - per joined pair, one BLAS ``a @ b`` block product in an
          Arrow-batched kernel (the genuinely-numeric inner kernel Python
          is *for*);
        - groupBy target position (i,j) and sum the ≤ gk partial blocks
          (applyInPandas — the shuffle carries exactly the partial
          products, the textbook block-matmul volume)."""
        if self.meta.ndim != 2 or other.meta.ndim != 2:
            raise ValueError("matmul is defined for 2-D arrays")
        if self.meta.chunks[1] != other.meta.chunks[0]:
            raise ValueError(
                f"inner tiling mismatch: {self.meta.chunks[1]} vs {other.meta.chunks[0]}"
            )
        out_dtype = _check_dtype(
            str(np.result_type(np.dtype(self.meta.dtype), np.dtype(other.meta.dtype)))
        )
        dtype = np.dtype(out_dtype)
        meta = GridMeta(
            self.meta.name,
            (self.meta.nb_chunks_per_dim[0], other.meta.nb_chunks_per_dim[1]),
            (self.meta.chunks[0], other.meta.chunks[1]),
            out_dtype,
        )
        dt_a, dt_b = np.dtype(self.meta.dtype), np.dtype(other.meta.dtype)
        a = self.materialize().df.select(
            F.col("pos")[0].alias("i"),
            F.col("pos")[1].alias("k"),
            F.col("chunk_shape").alias("sh_a"),
            F.col("data").alias("da"),
        )
        b = other.materialize().df.select(
            F.col("pos")[0].alias("bk"),
            F.col("pos")[1].alias("j"),
            F.col("chunk_shape").alias("sh_b"),
            F.col("data").alias("db"),
        )
        joined = a.join(b, a["k"] == b["bk"], "inner")

        def block_mul(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                prods = []
                for sa, da_, sb, db_ in zip(pdf["sh_a"], pdf["da"], pdf["sh_b"], pdf["db"]):
                    ma = np.frombuffer(da_, dtype=dt_a).reshape(tuple(int(x) for x in sa))
                    mb = np.frombuffer(db_, dtype=dt_b).reshape(tuple(int(x) for x in sb))
                    prods.append((ma.astype(dtype, copy=False) @ mb.astype(dtype, copy=False)).tobytes())
                yield pd.DataFrame({"i": pdf["i"], "j": pdf["j"], "part": prods})

        partials = joined.mapInPandas(block_mul, schema="i int, j int, part binary")
        name, ts = self.meta.name, self.timestep
        shape_of = {
            (i, j): (meta.chunks[0][i], meta.chunks[1][j])
            for i in range(meta.nb_chunks_per_dim[0])
            for j in range(meta.nb_chunks_per_dim[1])
        }

        def reduce_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
            i, j = int(key[0]), int(key[1])
            shp = shape_of[(i, j)]
            acc = np.zeros(shp[0] * shp[1], dtype=dtype)
            for part in pdf["part"]:
                acc += np.frombuffer(part, dtype=dtype)
            return pd.DataFrame(
                {
                    "name": [name],
                    "timestep": [ts],
                    "pos": [[i, j]],
                    "chunk_shape": [list(shp)],
                    "data": [acc.tobytes()],
                }
            )

        df = partials.groupBy("i", "j").applyInPandas(reduce_blocks, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def _is_slab_tiled(self) -> bool:
        """True iff chunked along axis 0 only — every chunk is then one
        contiguous C-order span of the global array."""
        return all(len(self.meta.chunks[d]) == 1 for d in range(1, self.meta.ndim))

    def ravel(self) -> "ChunkedArray":
        """C-order flatten to 1-D (dask ``da.ravel``).

        Slab-tiled arrays (chunked along axis 0 only) flatten with ZERO
        data movement: each chunk already is a contiguous C-order span, so
        only pos/chunk_shape metadata are rewritten (map-only select, the
        bytes column is untouched). Any other tiling first rechunks to
        slabs — elements move exactly once, the floor for a layout
        change."""
        if self.meta.ndim == 1:
            return self
        src = self
        if not src._is_slab_tiled():
            src = self.rechunk(
                (self.meta.chunks[0],) + tuple(self.meta.global_shape[1:])
            )
        row = reduce(mul, src.meta.global_shape[1:], 1)
        sizes = tuple(s * row for s in src.meta.chunks[0])
        meta = GridMeta(self.meta.name, (len(sizes),), (sizes,), self.meta.dtype)
        nelem = F.aggregate(
            F.col("chunk_shape"), F.lit(1), lambda acc, x: acc * x
        ).cast("int")
        df = src.materialize().df.select(
            "name",
            "timestep",
            F.array(F.col("pos")[0]).alias("pos"),
            F.array(nelem).alias("chunk_shape"),
            "data",
        )
        return ChunkedArray(df, meta, self.timestep)

    def reshape(self, new_shape, row_chunks: int | None = None) -> "ChunkedArray":
        """General C-order reshape (dask ``da.reshape``): ravel (zero-move
        when slab-tiled) → re-span the 1-D stream on row boundaries of the
        target shape → metadata-reinterpret each span as a slab chunk.
        When the flat tiling already aligns to target rows the re-span is
        skipped, making e.g. (R,C) → (R, a, b) splits fully map-only.
        ``row_chunks`` pins the output slab height (rows of the new shape
        per chunk); default keeps roughly the source chunk volume."""
        new_shape = tuple(int(s) for s in new_shape)
        total = reduce(mul, self.meta.global_shape, 1)
        if reduce(mul, new_shape, 1) != total:
            raise ValueError(
                f"cannot reshape {self.meta.global_shape} (size {total}) to {new_shape}"
            )
        flat = self.ravel()
        if len(new_shape) == 1:
            return flat
        row = reduce(mul, new_shape[1:], 1)
        flat_sizes = flat.meta.chunks[0]
        if row_chunks is None and all(s % row == 0 for s in flat_sizes):
            heights = tuple(s // row for s in flat_sizes)  # aligned: no shuffle
        else:
            if row_chunks is None:
                avg = sum(flat_sizes) // len(flat_sizes)
                row_chunks = min(new_shape[0], max(1, round(avg / row) or 1))
            heights = _tile(new_shape[0], row_chunks)
            flat = flat.rechunk((tuple(h * row for h in heights),))
        meta = GridMeta(
            self.meta.name,
            (len(heights),) + (1,) * (len(new_shape) - 1),
            (heights,) + tuple((s,) for s in new_shape[1:]),
            self.meta.dtype,
        )
        zeros = [F.lit(0)] * (len(new_shape) - 1)
        trail = [F.lit(int(s)) for s in new_shape[1:]]
        df = flat.materialize().df.select(
            "name",
            "timestep",
            F.concat(F.array(F.col("pos")[0]), F.array(*zeros)).alias("pos"),
            F.concat(
                F.array((F.col("chunk_shape")[0] / row).cast("int")), F.array(*trail)
            ).alias("chunk_shape"),
            "data",
        )
        return ChunkedArray(df, meta, self.timestep)

    def boolean_select(self, cond: "ChunkedArray") -> "ChunkedArray":
        """Boolean-mask indexing ``a[mask]`` (dask semantics): 1-D array of
        the elements where ``cond`` is nonzero, in global C order.

        Both sides ravel (zero-move when slab-tiled), flat chunks equi-join
        on position, and an Arrow-batched kernel keeps the masked elements
        per chunk. Output chunk sizes are data-dependent, so — exactly like
        dask's ``compute_chunk_sizes`` — the per-chunk counts come back to
        the driver first: n_chunks INTEGERS, never element data; the
        selected bytes are computed once (persisted) and reused as the
        result's chunk rows."""
        if self.meta.chunks != cond.meta.chunks:
            raise ValueError("grid mismatch")
        a = self.ravel().materialize()
        c = cond.ravel().materialize()
        am = a.df.select("pos", F.col("data").alias("__a"))
        cm = c.df.select(F.col("pos").alias("__cpos"), F.col("data").alias("__c"))
        joined = am.join(cm, am["pos"] == cm["__cpos"], "inner")
        dt, cdt = np.dtype(self.meta.dtype), np.dtype(cond.meta.dtype)

        def pick(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ks, ns, datas = [], [], []
                for pos, ba, bc in zip(pdf["pos"], pdf["__a"], pdf["__c"]):
                    va = np.frombuffer(ba, dtype=dt)
                    vc = np.frombuffer(bc, dtype=cdt)
                    sel = np.ascontiguousarray(va[vc != 0])
                    ks.append(int(pos[0]))
                    ns.append(sel.size)
                    datas.append(sel.tobytes())
                yield pd.DataFrame({"k": ks, "n": ns, "data": datas})

        # checkpoint, not persist: the counts collect below executes the
        # join+selection once and truncates lineage; local-mode blocks are
        # reclaimed by the ContextCleaner when the result is dereferenced,
        # so repeated boolean_select calls (e.g. per streaming micro-batch)
        # don't accumulate pinned storage the way an unpaired persist()
        # would. Default localCheckpoint trades executor-loss recovery for
        # speed; deployments flip lifecycle.RELIABLE_CHECKPOINT_CONF to
        # write reliable checkpoints instead (same switch as dedup's
        # label-propagation rounds).
        from doreisa_spark.lifecycle import checkpoint as _ckpt

        picked = _ckpt(
            joined.mapInPandas(pick, schema="k int, n int, data binary"), eager=True
        )
        counts = {int(r["k"]): int(r["n"]) for r in picked.select("k", "n").collect()}
        sizes = tuple(counts[k] for k in sorted(counts))
        # An all-False mask yields numpy's EMPTY 1-D result (all chunk
        # sizes zero): reductions compose (sum() == 0.0, size 0, matching
        # np.sum([])), as do materialize/to_numpy. Gather-style consumers
        # (take/compress) reject empty inputs with their own clear errors,
        # so the ADVICE-r5 "obscure downstream failure" cannot occur
        # silently. tests/test_advice_fixes.py pins these semantics.
        meta = GridMeta(self.meta.name, (len(sizes),), (sizes,), self.meta.dtype)
        name, ts = self.meta.name, self.timestep
        df = picked.select(
            F.lit(name).alias("name"),
            F.lit(ts).alias("timestep"),
            F.array(F.col("k")).alias("pos"),
            F.array(F.col("n")).alias("chunk_shape"),
            "data",
        )
        return ChunkedArray(df, meta, ts)

    def take(self, indices, axis: int = 0) -> "ChunkedArray":
        """Integer-array (fancy) indexing along one axis (dask
        ``da.take`` / ``a[idx_list]``): ``out[..., j, ...] =
        self[..., indices[j], ...]`` — duplicates and arbitrary order
        allowed.

        The index array is a driver-side object (like dask's) and rides
        broadcast inside the kernel closure. Each source chunk emits, per
        TARGET chunk, one gathered slab of the rows it owns for that
        target's output slots; a groupBy on target position assembles —
        the rechunk split/assemble shape, so every selected element moves
        exactly once and unreferenced chunks emit nothing."""
        idx = np.asarray(indices, dtype=np.int64)
        if idx.ndim != 1:
            raise ValueError("take expects a 1-D index array")
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim  # numpy convention: negative axis counts from the end
        extent = self.meta.global_shape[axis]
        if idx.size == 0:
            raise ValueError("take expects at least one index")
        if ((idx < -extent) | (idx >= extent)).any():
            raise IndexError(f"index out of bounds for axis {axis} with size {extent}")
        idx = np.where(idx < 0, idx + extent, idx)  # numpy negative indexing
        chunks = self.meta.chunks
        starts = np.concatenate([[0], np.cumsum(chunks[axis])]).astype(np.int64)
        # output tiling along the taken axis: blocks of the source's first
        # chunk extent (keeps chunk volume comparable)
        block = int(chunks[axis][0])
        heights = _tile(int(idx.size), block)
        out_chunks = tuple(
            chunks[d] if d != axis else heights for d in range(ndim)
        )
        meta = GridMeta(
            self.meta.name,
            tuple(len(c) for c in out_chunks),
            out_chunks,
            self.meta.dtype,
        )
        # per (source chunk k along axis, target chunk t): which local rows
        # to gather, landing at which local output slots
        src_of = np.searchsorted(starts, idx, side="right") - 1
        tgt_of = np.arange(idx.size) // block
        plan: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
        for j in range(idx.size):
            k, t = int(src_of[j]), int(tgt_of[j])
            rows, slots = plan.setdefault((k, t), ([], []))
            rows.append(int(idx[j] - starts[k]))
            slots.append(int(j - t * block))
        rows_fn = self._rows_fn()
        name, ts = self.meta.name, self.timestep
        dtype = np.dtype(self.meta.dtype)
        if idx.size <= _TAKE_DISTRIBUTE_AT:
            # dask-style driver index array: the plan rides in the kernel
            # closure (serialized once per stage). Prune BEFORE the
            # kernel: unreferenced chunks must not pay the decode/generate
            # pipeline (take([0]) from a 1000-chunk virtual array
            # generates 1 chunk, not 1000)
            needed = sorted({int(kk) for kk, _ in plan})
            src_df = self.df.where(F.col("pos")[axis].isin(needed))

            def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = {"pos": [], "slots": [], "piece": []}
                    for pos, arr in rows_fn(pdf):
                        k = pos[axis]
                        for t in range(len(heights)):
                            entry = plan.get((k, t))
                            if entry is None:
                                continue
                            rows, slots = entry
                            piece = np.ascontiguousarray(np.take(arr, rows, axis=axis))
                            tgt = list(pos)
                            tgt[axis] = t
                            out["pos"].append(tgt)
                            out["slots"].append(slots)
                            out["piece"].append(piece.tobytes())
                    if out["pos"]:  # all-unreferenced batch: emit nothing (an
                        # empty frame would type the list columns float64,
                        # which Arrow can't cast to list<int>)
                        yield pd.DataFrame(out)

            pieces = src_df.mapInPandas(
                split, schema="pos array<int>, slots array<int>, piece binary"
            )
        else:
            # Large index arrays (ADVICE r5): the gather plan ships as a
            # RELATION joined on the source-chunk key, not a dict captured
            # in every task closure — the driver serializes it exactly once
            # into plan_df, the inner join prunes unreferenced chunks, and
            # AQE picks broadcast vs shuffle by the plan's actual size. A
            # chunk referenced by T targets decodes T times here (vs once
            # on the closure path) — the standard trade for not shipping
            # O(len(indices)) state to every task.
            spark = self.df.sparkSession
            items = sorted(plan.items())
            plan_pdf = pd.DataFrame(
                {
                    "k": [k for (k, _), _ in items],
                    "t": [t for (_, t), _ in items],
                    "rows": [rs for _, (rs, _) in items],
                    "slots": [sl for _, (_, sl) in items],
                }
            )
            plan_df = spark.createDataFrame(
                plan_pdf, schema="k int, t int, rows array<int>, slots array<int>"
            )
            joined_src = self.df.join(plan_df, F.col("pos")[axis] == F.col("k"))

            def split_joined(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = {"pos": [], "slots": [], "piece": []}
                    for (pos, arr), t, rows, slots in zip(
                        rows_fn(pdf), pdf["t"], pdf["rows"], pdf["slots"]
                    ):
                        piece = np.ascontiguousarray(
                            np.take(arr, [int(r) for r in rows], axis=axis)
                        )
                        tgt = list(pos)
                        tgt[axis] = int(t)
                        out["pos"].append(tgt)
                        out["slots"].append([int(s) for s in slots])
                        out["piece"].append(piece.tobytes())
                    if out["pos"]:
                        yield pd.DataFrame(out)

            pieces = joined_src.mapInPandas(
                split_joined, schema="pos array<int>, slots array<int>, piece binary"
            )
        shape_of = {
            p: meta.shape_of(p)
            for p in product(*(range(g) for g in meta.nb_chunks_per_dim))
        }

        def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pos = tuple(int(x) for x in key[0])
            shape = shape_of[pos]
            tgt = np.zeros(shape, dtype=dtype)
            for slots, piece in zip(pdf["slots"], pdf["piece"]):
                slots = [int(s) for s in slots]
                pshape = tuple(
                    len(slots) if d == axis else shape[d] for d in range(ndim)
                )
                part = np.frombuffer(piece, dtype=dtype).reshape(pshape)
                loc = tuple(
                    slots if d == axis else slice(None) for d in range(ndim)
                )
                tgt[loc] = part
            return pd.DataFrame(
                {
                    "name": [name],
                    "timestep": [ts],
                    "pos": [list(pos)],
                    "chunk_shape": [list(shape)],
                    "data": [tgt.tobytes()],
                }
            )

        df = pieces.groupBy("pos").applyInPandas(assemble, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def flip(self, axis: int = 0) -> "ChunkedArray":
        """Reverse along one axis (numpy/dask ``flip``) with ZERO data
        movement: chunk positions mirror (pos → n-1-pos on the axis, a
        Catalyst expression over the pos column), the axis tiling
        reverses, and each chunk reverses in-place inside the fused Arrow
        stage — a pure map at any scale."""
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim
        n = self.meta.nb_chunks_per_dim[axis]
        new_chunks = tuple(
            self.meta.chunks[d][::-1] if d == axis else self.meta.chunks[d]
            for d in range(ndim)
        )
        meta = GridMeta(
            self.meta.name, self.meta.nb_chunks_per_dim, new_chunks, self.meta.dtype
        )
        if self._gen is not None:
            # virtual: the mirror is a bijection over the full grid, so the
            # pos frame is reused as-is and the flip composes into the
            # generation closure — still zero stages added
            g = self._gen

            def gen2(pos: tuple[int, ...]) -> np.ndarray:
                mp = list(pos)
                mp[axis] = n - 1 - pos[axis]
                return np.flip(g(tuple(mp)), axis=axis)

            return ChunkedArray(self.df, meta, self.timestep, gen=gen2)
        m = self.materialize()
        mirrored = m.df.withColumn(
            "pos",
            F.transform(
                "pos",
                lambda x, i: F.when(i == F.lit(axis), F.lit(n - 1) - x).otherwise(x),
            ),
        )
        out = ChunkedArray(mirrored, meta, self.timestep)
        return out.map_numpy(lambda a: np.flip(a, axis=axis))

    def roll(self, shift: int, axis: int = 0) -> "ChunkedArray":
        """Circular shift along one axis (numpy/dask ``roll``), lowered
        onto slice + concatenate: the tail block moves to the front —
        boundary chunks re-tile, interior chunks ride through untouched.
        The result keeps the global shape; tiling along the axis follows
        the two concatenated pieces."""
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim
        extent = self.meta.global_shape[axis]
        s = int(shift) % extent
        if s == 0:
            return self
        full = [(None, None)] * ndim
        head_region = list(full)
        head_region[axis] = (extent - s, extent)
        tail_region = list(full)
        tail_region[axis] = (0, extent - s)
        return ChunkedArray.concatenate(
            [self.slice(tuple(head_region)), self.slice(tuple(tail_region))],
            axis=axis,
        )

    def compress(self, mask, axis: int = 0) -> "ChunkedArray":
        """Select the slices of one axis where ``mask`` is true (numpy/dask
        ``compress``): a driver-side boolean vector lowered onto take()'s
        gather plan — mask length must equal the axis extent."""
        m = np.asarray(mask, dtype=bool)
        if m.ndim != 1:
            raise ValueError("compress expects a 1-D boolean mask")
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim
        if m.size != self.meta.global_shape[axis]:
            raise ValueError(
                f"mask length {m.size} != axis {axis} extent "
                f"{self.meta.global_shape[axis]}"
            )
        if not m.any():
            # zero-size chunked arrays aren't supported, so an all-False
            # mask can't produce numpy's empty result — fail with the
            # compress-level story instead of take()'s index complaint
            raise ValueError("compress mask selects nothing (all False)")
        return self.take(np.flatnonzero(m), axis=axis)

    def histogram(self, bins: int, range_: "tuple[float, float]") -> DataFrame:
        """Fixed-width histogram over the whole array (dask
        ``da.histogram`` with explicit bins+range) → DataFrame
        ``(bin int, lo double, hi double, count bigint)``, one row per
        bin (empty bins included).

        Scale shape: each chunk reduces to a ``bins``-long count vector
        via ``np.histogram`` inside the fused Arrow stage (map-side
        combine); the shuffle carries n_chunks·bins tiny rows into a
        groupBy-sum. numpy edge semantics exactly: right-open bins, last
        bin right-closed, out-of-range values dropped."""
        if bins <= 0:
            raise ValueError("bins must be positive")
        lo, hi = float(range_[0]), float(range_[1])
        if not lo < hi:
            raise ValueError("range must satisfy lo < hi")
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                bs: list[int] = []
                cs: list[int] = []
                for _, arr in rows_fn(pdf):
                    counts, _ = np.histogram(arr, bins=bins, range=(lo, hi))
                    bs.extend(range(bins))
                    cs.extend(int(c) for c in counts)
                yield pd.DataFrame(
                    {"bin": pd.Series(bs, dtype="int32"), "c": pd.Series(cs, dtype="int64")}
                )

        partials = self.df.mapInPandas(partial, schema="bin int, c bigint")
        width = (hi - lo) / bins
        return (
            partials.groupBy("bin")
            .agg(F.sum("c").alias("count"))
            .select(
                "bin",
                (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
                (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
                "count",
            )
        )

    def topk(self, k: int, *, largest: bool = True) -> DataFrame:
        """The k largest (or smallest) elements of the array (dask
        ``da.topk``) → DataFrame of one ``value`` column, sorted.

        Scale shape: each chunk emits only its own top-k via
        ``np.partition`` (O(chunk) selection, no chunk sort) inside the
        fused Arrow stage; the global winner set is a
        TakeOrderedAndProject over n_chunks·k tiny rows — no global sort,
        no full-data shuffle."""
        if k <= 0:
            raise ValueError("k must be positive")
        np_acc, sql_acc = _acc(self.meta.dtype, use="val")
        rows_fn = self._rows_fn()
        is_f = np_acc.kind == "f"

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals: list = []
                nans: list[bool] = []
                for _, arr in rows_fn(pdf):
                    flat = arr.ravel()
                    if is_f:
                        # NaN sorts as LARGEST in numpy; the Arrow hop
                        # would null it, so NaN candidates travel as an
                        # explicit flag and finite values compete among
                        # themselves
                        n_nan = int(np.isnan(flat).sum())
                        if n_nan:
                            flat = flat[~np.isnan(flat)]
                            nans.extend([True] * min(n_nan, k))
                            vals.extend([0.0] * min(n_nan, k))
                    if flat.size > k:
                        if largest:
                            flat = np.partition(flat, flat.size - k)[-k:]
                        else:
                            flat = np.partition(flat, k - 1)[:k]
                    vals.extend(flat.tolist())
                    nans.extend([False] * (len(vals) - len(nans)))
                yield pd.DataFrame(
                    {"__p": _partial_series(vals, np_acc), "__nan": nans}
                )

        partials = self.df.mapInPandas(partial, schema=f"__p {sql_acc}, __nan boolean")
        order = F.col("__p").desc() if largest else F.col("__p").asc()
        # NaN = numpy's largest value: leads the top-k when largest=True,
        # fills only after every finite value when largest=False
        nan_rank = F.col("__nan").desc() if largest else F.col("__nan").asc()
        value = (
            F.when(F.col("__nan"), F.lit(float("nan"))).otherwise(F.col("__p"))
            if is_f
            else F.col("__p")
        )
        return (
            partials.orderBy(nan_rank, order)
            .limit(k)
            .select(value.cast(sql_acc).alias("value"))
        )

    def tensordot(self, other: "ChunkedArray", axes=2) -> "ChunkedArray":
        """General N-d tensor contraction (dask ``da.tensordot``), lowered
        the standard way: transpose both operands so kept axes and
        contracted axes are grouped, reshape each to 2-D (map-only when
        slab-aligned), block matmul, reshape the result back to the kept
        extents. ``axes`` follows numpy: an int n contracts the last n axes
        of self with the first n of other; a pair of axis tuples contracts
        those pairs."""
        if isinstance(axes, int):
            ax_a = tuple(range(self.meta.ndim - axes, self.meta.ndim))
            ax_b = tuple(range(axes))
        else:
            ra, rb = axes
            ax_a = (ra,) if isinstance(ra, (int, np.integer)) else tuple(ra)
            ax_b = (rb,) if isinstance(rb, (int, np.integer)) else tuple(rb)
        # numpy allows negative axis indices — normalize before set math
        ax_a = tuple(int(d) % self.meta.ndim for d in ax_a)
        ax_b = tuple(int(d) % other.meta.ndim for d in ax_b)
        if len(ax_a) != len(ax_b):
            raise ValueError("axes lists must have equal length")
        ga, gb = self.meta.global_shape, other.meta.global_shape
        if tuple(ga[d] for d in ax_a) != tuple(gb[d] for d in ax_b):
            raise ValueError(
                f"contracted extents mismatch: {[ga[d] for d in ax_a]} vs "
                f"{[gb[d] for d in ax_b]}"
            )
        keep_a = tuple(d for d in range(self.meta.ndim) if d not in ax_a)
        keep_b = tuple(d for d in range(other.meta.ndim) if d not in ax_b)
        m = reduce(mul, (ga[d] for d in keep_a), 1)
        k = reduce(mul, (ga[d] for d in ax_a), 1)
        n = reduce(mul, (gb[d] for d in keep_b), 1)
        a2 = self.transpose(keep_a + ax_a).reshape((m, k))
        b2 = other.transpose(ax_b + keep_b).reshape((k, n))
        # Align the contracted tiling AND bound chunk volume: reshape emits
        # slab tilings (a2's k and b2's n unchunked), which for large
        # operands would funnel whole rows/columns through single binary
        # cells (Arrow caps a cell at 2 GiB, and one Python worker would
        # own the contraction). Tile k and n so no block exceeds
        # _TD_MAX_ELEMS; matmul's k-join then runs genuinely blockwise.
        if k == 0:
            raise ValueError("tensordot over a zero-size contracted extent")
        max_h = max(a2.meta.chunks[0])
        kb = min(k, max(1, _TD_MAX_ELEMS // max_h))
        k_tiling = _tile(k, kb)
        # n is capped against BOTH kb (b2 input blocks kb×nb) and max_h
        # (matmul OUTPUT blocks max_h×nb) — without the max_h term an outer
        # product (k=1) would emit max_h × _TD_MAX_ELEMS output cells
        nb = min(n, max(1, _TD_MAX_ELEMS // max(kb, max_h)))
        n_tiling = _tile(n, nb)
        if a2.meta.chunks[1] != k_tiling:
            a2 = a2.rechunk((a2.meta.chunks[0], k_tiling))
        if b2.meta.chunks != (k_tiling, n_tiling):
            b2 = b2.rechunk((k_tiling, n_tiling))
        c2 = a2.matmul(b2)
        out_shape = tuple(ga[d] for d in keep_a) + tuple(gb[d] for d in keep_b)
        if not out_shape:
            return c2.reshape((1,))  # full contraction: 1-element array
        return c2.reshape(out_shape)

    def _sum_out(self, axis: int) -> "ChunkedArray":
        """Array-valued sum over one axis (einsum's reduced-letter
        lowering): contraction against a ones vector chunk-aligned to the
        axis tiling, riding the blockwise tensordot path — the shuffle
        carries only contracted blocks, same as any tensordot."""
        global _EINSUM_ONES_SEQ
        tiling = self.meta.chunks[axis]
        chunks = {
            (i,): np.ones(sz, dtype=self.meta.dtype) for i, sz in enumerate(tiling)
        }
        _EINSUM_ONES_SEQ += 1
        ones = ChunkedArray.from_numpy_chunks(
            self.df.sparkSession, f"__einsum_ones_{_EINSUM_ONES_SEQ}", chunks
        )
        return self.tensordot(ones, axes=((axis,), (0,)))

    def einsum(self, spec: str, other: "ChunkedArray | None" = None) -> "ChunkedArray":
        """Einstein-summation subset over one or two chunked operands
        (dask ``da.einsum``), lowered onto the existing structural ops —
        no new kernel:

        - contracted indices (in both operands, absent from the output)
          → the blockwise ``tensordot`` lowering (transpose → reshape →
          block matmul);
        - reduced indices (in one operand only, absent from the output)
          → ``_sum_out`` (tensordot against an aligned ones vector);
        - output ordering → a final metadata-level ``transpose``.

        Subsumes matmul ('ij,jk->ik'), tensordot over any axis pairs,
        outer product ('i,j->ij'), Frobenius inner product ('ij,ij->'),
        per-operand axis sums ('ij,kj->ik' after reducing unused letters)
        and pure transposition ('ij->ji'). Implicit (no '->') output
        follows numpy: once-occurring letters in alphabetical order.

        Unsupported, by explicit error: repeated letters within one
        operand (diagonal extraction — see ``diagonal``) and batch
        indices (present in both inputs AND the output, e.g.
        'bij,bjk->bik'), which need a blockwise batched matmul rather
        than a single contraction.

        100 TB posture: identical to tensordot's — every lowering step is
        the already-audited transpose/reshape/rechunk/matmul pipeline
        (bounded block sizes, one k-aligned shuffle per contraction)."""
        spec = spec.replace(" ", "")
        lhs, arrow, out_spec = spec.partition("->")
        terms = lhs.split(",")
        ops: list[ChunkedArray] = [self] + ([other] if other is not None else [])
        if len(terms) != len(ops):
            raise ValueError(
                f"spec {spec!r} names {len(terms)} operand(s), got {len(ops)}"
            )
        for t, op in zip(terms, ops):
            if len(t) != op.meta.ndim:
                raise ValueError(
                    f"term {t!r} has {len(t)} indices for an ndim-{op.meta.ndim} operand"
                )
            if len(set(t)) != len(t):
                raise NotImplementedError(
                    "repeated index within one operand (diagonal) is unsupported"
                )
        counts = Counter("".join(terms))
        if not arrow:
            out_spec = "".join(sorted(c for c, n in counts.items() if n == 1))
        if len(set(out_spec)) != len(out_spec) or any(c not in counts for c in out_spec):
            raise ValueError(f"invalid output spec {out_spec!r} for input {lhs!r}")
        extents: dict[str, int] = {}
        for t, op in zip(terms, ops):
            for c, ext in zip(t, op.meta.global_shape):
                if extents.setdefault(c, ext) != ext:
                    raise ValueError(
                        f"index {c!r}: mismatched extents {extents[c]} vs {ext}"
                    )
        if other is None:
            arr, t = self, terms[0]
            for c in [c for c in t if c not in out_spec]:
                arr = arr._sum_out(t.index(c))
                t = t.replace(c, "")
            perm = tuple(t.index(c) for c in out_spec)
            return arr if perm == tuple(range(len(perm))) else arr.transpose(perm)
        ta, tb = terms
        batch = [c for c in ta if c in tb and c in out_spec]
        if batch:
            raise NotImplementedError(
                f"batch indices {batch!r} (in both operands and the output) are "
                "unsupported — contract per batch or use blockwise matmul"
            )
        a, b = self, other
        for c in [c for c in ta if c not in tb and c not in out_spec]:
            a = a._sum_out(ta.index(c))
            ta = ta.replace(c, "")
        for c in [c for c in tb if c not in ta and c not in out_spec]:
            b = b._sum_out(tb.index(c))
            tb = tb.replace(c, "")
        contracted = [c for c in ta if c in tb]
        td = a.tensordot(
            b,
            axes=(
                tuple(ta.index(c) for c in contracted),
                tuple(tb.index(c) for c in contracted),
            ),
        )
        kept = [c for c in ta if c not in contracted] + [
            c for c in tb if c not in contracted
        ]
        if not kept:
            return td  # full contraction: tensordot's 1-element array
        perm = tuple(kept.index(c) for c in out_spec)
        return td if perm == tuple(range(len(perm))) else td.transpose(perm)

    def pad(self, pad_width, constant_value=0.0) -> "ChunkedArray":
        """Constant-mode pad (numpy/dask ``pad(mode='constant')``) as a
        PURE MAP: the chunk grid is unchanged, only edge chunks grow (the
        pos-aware np.pad fuses into the pipeline), so no data moves at
        any scale. ``pad_width`` follows numpy: an int, a (before, after)
        pair, or per-axis pairs."""
        ndim = self.meta.ndim
        pw = np.asarray(pad_width, dtype=np.int64)
        if pw.ndim == 0:
            pw = np.tile(pw, (ndim, 2))
        elif pw.shape == (2,):
            pw = np.tile(pw, (ndim, 1))
        if pw.shape != (ndim, 2) or (pw < 0).any():
            raise ValueError(f"bad pad_width {pad_width!r} for ndim {ndim}")
        chunks = self.meta.chunks
        new_chunks = []
        for d in range(ndim):
            sizes = list(chunks[d])
            sizes[0] += int(pw[d][0])
            sizes[-1] += int(pw[d][1])  # single-chunk dims absorb both
            new_chunks.append(tuple(sizes))
        meta = GridMeta(
            self.meta.name,
            self.meta.nb_chunks_per_dim,
            tuple(new_chunks),
            self.meta.dtype,
        )
        last = tuple(n - 1 for n in self.meta.nb_chunks_per_dim)
        widths_of = pw.tolist()
        cval = constant_value

        def step(pos, arr):
            w = tuple(
                (
                    widths_of[d][0] if pos[d] == 0 else 0,
                    widths_of[d][1] if pos[d] == last[d] else 0,
                )
                for d in range(len(pos))
            )
            if not any(b or a for b, a in w):
                return arr
            return np.pad(arr, w, mode="constant", constant_values=cval)

        return self._compose(step, meta)

    def percentile(self, q: float) -> float:
        """EXACT global percentile with numpy's linear interpolation —
        distributed via iterative histogram refinement (the
        t-digest-free exact algorithm): locate the bin holding each
        needed order statistic with a 1024-bin range-restricted histogram
        (one fused map-side pass per round), narrow the value range to
        that bin, and collect only when the candidate set is small. Ranks
        are known without a count pass (dense arrays: n = prod(shape)).

        Convergence: each round shrinks the value range 1024x, so ~6
        rounds pin any double range; a bin that stops shrinking means the
        remaining candidates are (nearly) identical values and the
        algorithm collects them (bounded by the collect threshold). The
        driver never sees more than threshold elements — this is dask's
        ``da.percentile`` promise but exact instead of approximate."""
        return self.percentiles([q])[0]

    def percentiles(self, qs: "list[float]") -> "list[float]":
        """Several percentiles in one go: the global (min, max) scans run
        ONCE and every needed order statistic resolves against the shared
        range (a 3-quantile call costs 2 bounding scans + one refinement
        per distinct rank, not 6 bounding scans)."""
        import math

        n = int(np.prod(self.meta.global_shape))
        if n == 0:
            raise ValueError("percentile of an empty array")
        for q in qs:
            if not 0 <= q <= 100:
                raise ValueError("q must be in [0, 100]")
        lo = float(self.min().first()["min_value"])
        hi = float(self.max().first()["max_value"])
        ranks: dict[int, float] = {}

        def stat(k: int) -> float:
            if k not in ranks:
                ranks[k] = self._order_stat(k, lo, hi, below=0)
            return ranks[k]

        out = []
        for q in qs:
            pos = (n - 1) * (q / 100.0)
            k = int(math.floor(pos))
            frac = pos - k
            xk = stat(k)
            out.append(xk if frac == 0.0 else xk + frac * (stat(k + 1) - xk))
        return out

    _PCTL_BINS = 1024
    _PCTL_COLLECT = 1 << 20  # collect candidates when <= ~8 MB of doubles

    def _order_stat(self, rank: int, lo: float, hi: float, below: int) -> float:
        """Value of the rank-th (0-indexed) smallest element, searching
        the half-open candidate range [lo, hi] given ``below`` elements
        are known smaller than lo."""
        rows_fn = self._rows_fn()
        for _ in range(80):
            if lo == hi:
                return lo
            counts = [0] * self._PCTL_BINS
            for r in self.histogram(self._PCTL_BINS, (lo, hi)).collect():
                counts[r["bin"]] = r["count"]
            # the EXACT edges np.histogram used inside the map-side pass —
            # lo + b*width can disagree with linspace-derived edges by an
            # ulp, shrinking the collected candidate set below the counted
            # bin population (ADVICE r6)
            edges = np.histogram_bin_edges(
                np.empty(0), bins=self._PCTL_BINS, range=(lo, hi)
            )
            cum = below
            for b, c in enumerate(counts):
                if cum + c > rank:
                    blo = float(edges[b])
                    bhi = hi if b == self._PCTL_BINS - 1 else float(edges[b + 1])
                    if c <= self._PCTL_COLLECT or (bhi - blo) <= 0:
                        # degenerate width (massive ties narrowed the range
                        # to one representable value) must collect
                        # INCLUSIVELY — a half-open [blo, bhi) with
                        # blo == bhi selects nothing and IndexErrors
                        closed = b == self._PCTL_BINS - 1 or (bhi - blo) <= 0
                        return self._collect_rank(blo, bhi, closed,
                                                  rank - cum, rows_fn)
                    lo, hi, below = blo, bhi, cum
                    break
                cum += c
            else:  # numerical edge: rank fell past the last bin
                return hi
        return self._collect_rank(lo, hi, True, rank - below, rows_fn)

    def _collect_rank(self, blo, bhi, closed, local_rank, rows_fn) -> float:
        """Gather the candidates inside one bin and pick the local rank —
        the only driver-side materialization, bounded by the bin count."""
        def gather(glo: float, ghi: float, gclosed: bool) -> np.ndarray:
            def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = []
                    for _, arr in rows_fn(pdf):
                        a = arr.astype(np.float64, copy=False).ravel()
                        m = (a >= glo) & ((a <= ghi) if gclosed else (a < ghi))
                        out.append(a[m])
                    vals = np.concatenate(out) if out else np.empty(0)
                    yield pd.DataFrame({"v": pd.Series(vals, dtype="float64")})

            # Arrow transfer (toPandas), NOT collect(): a threshold-sized bin
            # is ~8 MB as a float64 block but hundreds of MB as boxed Rows
            pdf = self.df.mapInPandas(extract, schema="v double").toPandas()
            return np.sort(pdf["v"].to_numpy(dtype=np.float64))

        vals = gather(blo, bhi, closed)
        if local_rank >= len(vals):
            # belt-and-suspenders vs last-ulp edge disagreement between the
            # driver's bin bounds and the map-side histogram's: widen the
            # UPPER edge a few ulps and collect CLOSED. The lower edge is
            # NOT widened — blo is bit-identical to the map-side
            # np.histogram edge (histogram_bin_edges, r6 fix), so every
            # element the map-side counted into THIS bin satisfies
            # v >= blo already, while a widened lower edge would pull in
            # bin b-1 stragglers that sort before the target and shift
            # local_rank (ADVICE r7). An upper straggler belongs to this
            # bin and sorts after the target, so the rank is unshifted.
            ghi = bhi
            for _ in range(4):
                ghi = np.nextafter(ghi, np.inf)
            vals = gather(blo, float(ghi), True)
            if local_rank >= len(vals):
                raise RuntimeError(
                    f"percentile candidate window [{blo}, {bhi}] holds "
                    f"{len(vals)} elements, rank {local_rank} requested — "
                    "map-side histogram and driver bin edges disagree "
                    "beyond 4 ulps"
                )
        return float(vals[local_rank])

    def sort(self, axis: int = -1) -> "ChunkedArray":
        """Sort along one axis (numpy ``np.sort`` semantics, ascending).

        The sort axis is first rechunked contiguous — the one unavoidable
        all-to-all move for a cross-chunk sort — then every slab sorts
        in-kernel, embarrassingly parallel over the other axes. The
        contract (axis extent fits one chunk) is the standard dask shape;
        a global 1-D sort of relational data belongs to the SQL engine's
        range-partitioned ORDER BY instead."""
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim
        src = self
        if self.meta.nb_chunks_per_dim[axis] > 1:
            src = self.rechunk(
                tuple(
                    (self.meta.global_shape[d],) if d == axis else self.meta.chunks[d]
                    for d in range(ndim)
                )
            )
        return src._compose(lambda pos, arr: np.sort(arr, axis=axis))

    def _split_axis(self, axis: int) -> "ChunkedArray":
        """View axis ``d`` of length N = P·c (equal chunks of c) as the
        axis pair (P, c) with the SAME bytes: chunk p along d becomes the
        (p, 0) tile of the pair. Pure metadata — pos/chunk_shape column
        rewrite; a chunk's C-order buffer for (..., c, ...) is identical
        to (..., 1, c, ...). The distributed-FFT building block."""
        ndim = self.meta.ndim
        sizes = self.meta.chunks[axis]
        if len(set(sizes)) != 1:
            raise ValueError("_split_axis needs equal chunks along the axis")
        c = sizes[0]
        P = len(sizes)
        src = self.materialize()
        pos_expr = "array(" + ", ".join(
            [f"pos[{d}]" for d in range(axis + 1)]
            + ["0"]
            + [f"pos[{d}]" for d in range(axis + 1, ndim)]
        ) + ")"
        shp_expr = "array(" + ", ".join(
            [f"chunk_shape[{d}]" for d in range(axis)]
            + ["1", f"chunk_shape[{axis}]"]
            + [f"chunk_shape[{d}]" for d in range(axis + 1, ndim)]
        ) + ")"
        df = src.df.select(
            "name",
            "timestep",
            F.expr(pos_expr).alias("pos"),
            F.expr(shp_expr).alias("chunk_shape"),
            "data",
        )
        meta = self.meta._replaced(
            nb_chunks_per_dim=self.meta.nb_chunks_per_dim[:axis]
            + (P, 1)
            + self.meta.nb_chunks_per_dim[axis + 1 :],
            chunk_shape=self.meta.chunks[:axis]
            + ((1,) * P, (c,))
            + self.meta.chunks[axis + 1 :],
        )
        return ChunkedArray(df, meta, self.timestep)

    def _merge_axis_pair(self, axis: int) -> "ChunkedArray":
        """Inverse of ``_split_axis``: merge axes (d, d+1) into one axis
        with C-order index ``major·len(minor) + minor``. Requires the
        minor axis to be ONE chunk (full extent per tile) so every chunk
        covers a contiguous span of the merged axis — then the merge is
        again a pure metadata rewrite of the same bytes."""
        ndim = self.meta.ndim
        if self.meta.nb_chunks_per_dim[axis + 1] != 1:
            raise ValueError("_merge_axis_pair needs a single chunk on the minor axis")
        m = self.meta.chunks[axis + 1][0]
        src = self.materialize()
        pos_expr = "array(" + ", ".join(
            [f"pos[{d}]" for d in range(axis + 1)]
            + [f"pos[{d}]" for d in range(axis + 2, ndim)]
        ) + ")"
        shp_expr = "array(" + ", ".join(
            [f"chunk_shape[{d}]" for d in range(axis)]
            + [f"chunk_shape[{axis}] * chunk_shape[{axis + 1}]"]
            + [f"chunk_shape[{d}]" for d in range(axis + 2, ndim)]
        ) + ")"
        df = src.df.select(
            "name",
            "timestep",
            F.expr(pos_expr).alias("pos"),
            F.expr(shp_expr).alias("chunk_shape"),
            "data",
        )
        meta = self.meta._replaced(
            nb_chunks_per_dim=self.meta.nb_chunks_per_dim[:axis]
            + (self.meta.nb_chunks_per_dim[axis],)
            + self.meta.nb_chunks_per_dim[axis + 2 :],
            chunk_shape=self.meta.chunks[:axis]
            + (tuple(t * m for t in self.meta.chunks[axis]),)
            + self.meta.chunks[axis + 2 :],
        )
        return ChunkedArray(df, meta, self.timestep)

    # one slab chunk after the rechunk-contiguous FFT path may hold at most
    # this many elements (64M ≈ 1 GiB complex128); a longer multi-chunk
    # transform axis takes the four-step distributed DFT instead
    _FFT_SLAB_MAX = 64 * (1 << 20)

    def _fft_four_step(self, axis: int, inverse: bool) -> "ChunkedArray":
        """Distributed DFT along a multi-chunk axis — the classic
        four-step (transpose) algorithm, expressed over the existing
        rechunk/transpose/compose machinery so every data move is one of
        the verified primitives:

        with N = P·c (P chunks of c) and the index splits n = p·c + j,
        k = k1 + P·k2 (k1 < P, k2 < c):

            X[k1 + P·k2] = Σ_j W_c^{j·k2} · W_N^{j·k1} · Σ_p W_P^{p·k1} x[p·c + j]

        1. view the axis as the (P, c) pair (metadata-only split);
        2. rechunk to j-slabs (all p per slab — all-to-all #1), then
           FFT over the length-P axis + twiddle W_N^{±j·k1} in one fused
           kernel;
        3. rechunk to k1-slabs (full j extent — all-to-all #2), then
           FFT over the length-c axis;
        4. transpose the pair (map-only), rechunk the k1 axis contiguous
           (all-to-all #3) and merge (metadata-only) — the natural-order
           spectrum, chunked along the transform axis.

        Three all-to-alls is the textbook lower-bound shape for a
        natural-order distributed FFT; each moves every element once.
        Inverse: conjugate twiddles + ifft in both stages (the two 1/n
        normalizations compose to the required 1/N)."""
        ndim = self.meta.ndim
        sizes = self.meta.chunks[axis]
        c = sizes[0]
        P = len(sizes)
        n_total = P * c
        split = self._split_axis(axis)  # axes: axis -> (P as d, c as d+1)
        d = axis
        other = lambda m: m.chunks[:d] + m.chunks[d + 2 :]  # noqa: E731

        # ---- stage 1: j-slabs, FFT over p (length P), twiddle
        cj = _tile(c, max(1, math.ceil(c / P)))
        s1 = split.rechunk(
            split.meta.chunks[:d] + ((P,), cj) + split.meta.chunks[d + 2 :]
        )
        j_offs = tuple(int(x) for x in np.concatenate([[0], np.cumsum(cj)]))
        sign = 2j if inverse else -2j  # twiddle rotation matches the kernels'
        base_fft = np.fft.ifft if inverse else np.fft.fft

        def stage1(pos, arr):
            E = base_fft(arr, axis=d)
            j0 = j_offs[pos[d + 1]]
            jj = j0 + np.arange(arr.shape[d + 1])
            tw = np.exp(
                sign * np.pi * np.outer(np.arange(P), jj) / n_total
            )
            shape = [1] * arr.ndim
            shape[d], shape[d + 1] = P, len(jj)
            return E * tw.reshape(shape)

        e1 = s1._compose(stage1, s1.meta._replaced(dtype="complex128"))

        # ---- stage 2: k1-slabs (full j), FFT over j (length c)
        pq = _tile(P, max(1, math.ceil(P / max(1, len(cj)))))
        s2 = e1.rechunk(e1.meta.chunks[:d] + (pq, (c,)) + e1.meta.chunks[d + 2 :])
        f2 = s2._compose(
            lambda pos, arr: base_fft(arr, axis=d + 1),
            s2.meta._replaced(dtype="complex128"),
        )

        # ---- stage 3: natural order — swap (k1, k2), k1 contiguous, merge
        perm = list(range(ndim + 1))
        perm[d], perm[d + 1] = perm[d + 1], perm[d]
        t = f2.transpose(tuple(perm))  # axes: d = k2 (one chunk c), d+1 = k1 (pq)
        c2 = _tile(c, max(1, math.ceil(c / P)))
        t2 = t.rechunk(t.meta.chunks[:d] + (c2, (P,)) + t.meta.chunks[d + 2 :])
        return t2._merge_axis_pair(d)

    def _fft_impl(self, axis: int, inverse: bool, method: str) -> "ChunkedArray":
        ndim = self.meta.ndim
        if not (-ndim <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        axis %= ndim
        if method not in ("auto", "slab", "fourstep"):
            raise ValueError(f"unknown fft method {method!r}")
        sizes = self.meta.chunks[axis]
        n_total = self.meta.global_shape[axis]
        # worst-case slab size if the axis were rechunked contiguous
        other_max = 1
        for dd in range(ndim):
            if dd != axis:
                other_max *= max(self.meta.chunks[dd])
        slab_elems = n_total * other_max
        can_four = len(sizes) > 1 and len(set(sizes)) == 1
        if method == "auto":
            method = (
                "fourstep"
                if can_four and slab_elems > self._FFT_SLAB_MAX
                else "slab"
            )
        if method == "fourstep":
            if not can_four:
                raise ValueError(
                    "four-step FFT needs >1 EQUAL chunks along the transform "
                    f"axis (got sizes {sizes}); rechunk to an equal tiling "
                    "whose size divides the axis length first"
                )
            return self._fft_four_step(axis, inverse)
        if slab_elems > self._FFT_SLAB_MAX and len(sizes) > 1:
            # auto chose slab only because the tiling is unequal
            raise ValueError(
                f"FFT axis {axis} would need a {slab_elems}-element slab "
                f"(> _FFT_SLAB_MAX={self._FFT_SLAB_MAX}) and its unequal "
                f"chunk tiling {sizes} blocks the four-step path — rechunk "
                "the axis to equal chunks first"
            )
        src = self
        if len(sizes) > 1:
            src = self.rechunk(
                tuple(
                    (n_total,) if dd == axis else self.meta.chunks[dd]
                    for dd in range(ndim)
                )
            )
        kern = np.fft.ifft if inverse else np.fft.fft
        return src._compose(
            lambda pos, arr: kern(arr, axis=axis),
            src.meta._replaced(dtype="complex128"),
        )

    def fft(self, axis: int = -1, method: str = "auto") -> "ChunkedArray":
        """Discrete Fourier transform along one axis — the canonical
        in-situ spectral analytic for the simulation grids the reference
        targets.

        Two physical strategies (``method='auto'`` picks):

        - **slab** (dask ``da.fft.fft`` shape): the transform axis is
          rechunked contiguous — one all-to-all — then every slab
          transforms in-kernel via ``np.fft.fft``, embarrassingly
          parallel over the other axes. Right whenever a slab fits an
          executor (``_FFT_SLAB_MAX`` elements).
        - **fourstep**: the distributed transpose DFT for axes too long
          for one slab (see ``_fft_four_step``) — dask itself cannot do
          this (it imposes the one-chunk contract); needed for e.g. a
          10^9-sample simulation time axis at 100x scale.

        Output is a complex128 ChunkedArray; compose with the complex
        elementwise ops (e.g. ``x * conj`` for the power spectrum) and
        sum()/mean()'s paired-double complex folds."""
        return self._fft_impl(axis, inverse=False, method=method)

    def ifft(self, axis: int = -1, method: str = "auto") -> "ChunkedArray":
        """Inverse DFT along one axis (dask ``da.fft.ifft``) — same
        slab/four-step strategy split as ``fft``; complex128 output
        (``ifft(fft(x))`` recovers x up to IEEE rounding; take ``.real``
        via map_numpy for real signals)."""
        return self._fft_impl(axis, inverse=True, method=method)

    def power_spectrum(self, axis: int = -1, method: str = "auto") -> "ChunkedArray":
        """|FFT|² along one axis → float64 array (periodogram, unscaled).
        One fused pipeline: rechunk + DFT + squared magnitude never leave
        the per-slab kernel (``method`` as in :meth:`fft`)."""
        f = self.fft(axis, method)
        return f._compose(
            lambda pos, arr: (arr * np.conj(arr)).real,
            f.meta._replaced(dtype="float64"),
        )

    def diagonal(self, offset: int = 0) -> "ChunkedArray":
        """Diagonal of a 2-D array as a 1-D array (numpy ``diagonal``,
        positive offset above the main diagonal): lowered onto
        ravel + take with flat indices r·C + c — every diagonal element
        moves exactly once through the existing gather split/assemble;
        large diagonals automatically ride take()'s distributed-plan
        path."""
        if self.meta.ndim != 2:
            raise ValueError("diagonal is defined for 2-D arrays")
        n, m = self.meta.global_shape
        length = min(n, m - offset) if offset >= 0 else min(n + offset, m)
        if length <= 0:
            raise ValueError(f"offset {offset} yields an empty diagonal")
        i = np.arange(length, dtype=np.int64)
        r = i if offset >= 0 else i - offset
        c = i + offset if offset >= 0 else i
        return self.ravel().take(r * m + c)

    def broadcast_to(self, shape, chunks=None) -> "ChunkedArray":
        """Materialized broadcast to a larger shape (numpy
        ``broadcast_to`` alignment: trailing dims match; a source dim
        must equal the target extent or be 1; leading target dims are
        new). ``chunks`` optionally pins the tiling of each broadcast
        dim (new or size-1→n); default keeps chunk volume under the
        tensordot block cap.

        Each output chunk joins to its one source chunk (new/size-1 dims
        probe source position 0) and tiles in-kernel — a map-side
        replicate whose output volume IS the broadcast's semantics.
        Prefer fused broadcasting (scale_axis / binary ops on virtual
        arrays) when the broadcast feeds a single consumer; this exists
        for dask-API parity and for materializing small-into-large
        joins."""
        shape = tuple(int(s) for s in shape)
        ndim_out = len(shape)
        ndim_src = self.meta.ndim
        k = ndim_out - ndim_src
        if k < 0:
            raise ValueError(f"cannot broadcast {self.meta.global_shape} to {shape}")
        src_shape = self.meta.global_shape
        for j in range(ndim_src):
            if src_shape[j] != shape[k + j] and src_shape[j] != 1:
                raise ValueError(
                    f"dim {j} (extent {src_shape[j]}) does not broadcast to {shape[k + j]}"
                )
        bdims = [d for d in range(ndim_out) if d < k or src_shape[d - k] != shape[d]]
        if chunks is not None:
            if len(chunks) != len(bdims):
                raise ValueError(
                    f"chunks must give one tiling block per broadcast dim ({len(bdims)})"
                )
            tile_of = {d: int(b) for d, b in zip(bdims, chunks)}
        else:
            vol = reduce(
                mul, (max(self.meta.chunks[j]) for j in range(ndim_src)), 1
            )
            tile_of = {}
            for d in bdims:
                b = min(shape[d], max(1, _TD_MAX_ELEMS // vol))
                tile_of[d] = b
                vol *= b
        out_chunks = tuple(
            _tile(shape[d], tile_of[d]) if d in tile_of else self.meta.chunks[d - k]
            for d in range(ndim_out)
        )
        meta = GridMeta(
            self.meta.name,
            tuple(len(t) for t in out_chunks),
            out_chunks,
            self.meta.dtype,
        )
        src = self.materialize()
        spark = self.df.sparkSession
        opos = self._pos_df(spark, meta).select(F.col("pos").alias("opos"))
        # each output chunk's source position: broadcast source dims probe 0
        src_pos = F.array(
            *[
                F.lit(0) if (d + k) in tile_of else F.col("opos")[d + k]
                for d in range(ndim_src)
            ]
        )
        joined = opos.withColumn("__sp", src_pos).join(
            src.df, F.col("__sp") == F.col("pos")
        )
        rows_fn = src._rows_fn()
        name, ts = self.meta.name, self.timestep
        dtype = np.dtype(self.meta.dtype)

        def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for (pos_src, arr), op in zip(rows_fn(pdf), pdf["opos"]):
                    op = tuple(int(x) for x in op)
                    oshape = meta.shape_of(op)
                    a = arr.reshape((1,) * k + arr.shape)
                    tiled = np.ascontiguousarray(
                        np.broadcast_to(a, oshape).astype(dtype, copy=False)
                    )
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(op))
                    out["chunk_shape"].append(list(oshape))
                    out["data"].append(tiled.tobytes())
                yield pd.DataFrame(out)

        return ChunkedArray(joined.mapInPandas(tile, schema=CHUNK_SCHEMA), meta, ts)

    def unique(self) -> DataFrame:
        """Distinct element values with occurrence counts → DataFrame
        ``(value, n_occurrences)``.

        numpy/dask return a sorted value array; the natural Spark result
        is a relation (order belongs to the consumer). Per-chunk
        ``np.unique`` acts as a map-side combine — only each chunk's
        distinct (value, count) rows shuffle into ONE hash aggregate,
        never raw elements — so a 100 TB array with bounded cardinality
        aggregates in a single narrow exchange. uint64 values travel as
        DECIMAL(20,0) (exact); float NaN surfaces as a NULL value row
        (the Arrow NaN→NULL hop, see module gotchas)."""
        np_dt = np.dtype(self.meta.dtype)
        if np_dt.kind == "c":
            raise TypeError(
                "unique() is unsupported for complex arrays (no SQL value type); "
                "dedupe on .real/.imag components instead"
            )
        if np_dt == np.uint64:
            vtype = "decimal(20,0)"
        elif np_dt.kind in "iu":
            vtype = "bigint"
        else:
            vtype = "double"
        rows_fn = self._rows_fn()

        def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals: list = []
                cnts: list = []
                for _pos, arr in rows_fn(pdf):
                    v, c = np.unique(arr, return_counts=True)
                    vals.extend(v.tolist())
                    cnts.extend(c.tolist())
                yield pd.DataFrame(
                    {
                        "value": _partial_series(vals, np_dt)
                        if np_dt == np.uint64
                        else pd.Series(vals, dtype="float64" if np_dt.kind == "f" else "int64"),
                        "n": pd.Series(cnts, dtype="int64"),
                    }
                )

        parts = self.df.mapInPandas(kern, schema=f"value {vtype}, n bigint")
        return parts.groupBy("value").agg(F.sum("n").alias("n_occurrences"))

    # ----------------------------------------------------------- reductions
    def sum(self) -> DataFrame:
        """Global sum: fused pipeline + per-chunk numpy partial in ONE
        Python stage → tiny final agg. One row, column `total` — BIGINT for
        integer arrays (exact past 2^53), DOUBLE for float arrays,
        DECIMAL(38,0) for uint64 (exact true value, no wraparound).

        numpy NaN contract for floats: any NaN anywhere → total is NaN.
        The NaN marker travels as a boolean because the Arrow hop nulls
        float NaN and F.sum would silently SKIP the whole chunk's
        partial.

        Complex arrays: two columns ``total_re, total_im`` (the partials
        cross the Arrow hop as paired doubles; each component carries its
        own NaN marker)."""
        if np.dtype(self.meta.dtype).kind == "c":
            return self._complex_moment(mean=False)
        np_acc, sql_acc = _acc(self.meta.dtype)
        rows_fn = self._rows_fn()
        u64 = np_acc == np.uint64

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals = [
                    _exact_u64_sum(arr) if u64 else arr.sum(dtype=np_acc)
                    for _, arr in rows_fn(pdf)
                ]
                yield pd.DataFrame(
                    {
                        "__p": _partial_series(vals, np_acc),
                        "__nan": [bool(v != v) for v in vals],
                    }
                )

        partials = self.df.mapInPandas(partial, schema=f"__p {sql_acc}, __nan boolean")
        total = _nan_aware(np_acc, F.sum("__p"), F.max("__nan"))
        return partials.agg(total.cast(sql_acc).alias("total"))

    def _extreme(self, which: str) -> DataFrame:
        """Shared min/max plan: per-chunk numpy partial in the fused
        Python stage → one tiny final agg row. Exact: no accumulation,
        only comparisons, so the SQL type mirrors the array's kind.
        numpy NaN contract: any NaN → result is NaN (boolean marker, see
        _nan_aware)."""
        np_acc, sql_acc = _acc(self.meta.dtype, use="val")
        rows_fn = self._rows_fn()
        np_red = np.min if which == "min" else np.max
        alias = f"{which}_value"

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals = [np_red(arr) for _, arr in rows_fn(pdf)]
                yield pd.DataFrame(
                    {
                        "__p": _partial_series(vals, np_acc),
                        "__nan": [bool(v != v) for v in vals],
                    }
                )

        partials = self.df.mapInPandas(partial, schema=f"__p {sql_acc}, __nan boolean")
        agg = F.min("__p") if which == "min" else F.max("__p")
        value = _nan_aware(np_acc, agg, F.max("__nan"))
        return partials.agg(value.cast(sql_acc).alias(alias))

    def min(self) -> DataFrame:
        """Global minimum — one row, column ``min_value``."""
        return self._extreme("min")

    def max(self) -> DataFrame:
        """Global maximum — one row, column ``max_value``."""
        return self._extreme("max")

    def _arg_extreme(self, which: str) -> DataFrame:
        """Shared argmin/argmax plan: each chunk emits its own extreme and
        that element's GLOBAL coordinates (one tiny row per chunk); the
        final winner is a 1-row sort over n_chunks rows. Ties resolve to
        the lowest coordinate tuple — numpy's own first-occurrence rule,
        made global by ordering on coords.

        NaN contract = numpy's: ``np.argmin``/``np.argmax`` both return the
        FIRST NaN (all comparisons against NaN are false), so per-chunk
        numpy already reports its first NaN; the global sort then puts NaN
        rows first and picks the lex-smallest coords — which in C order IS
        the globally first NaN. The NaN marker travels as an explicit
        ``__nan`` boolean because the Arrow pandas→JVM hop converts float
        NaN to NULL, so neither ``isnan`` nor Spark's NaN sort order ever
        sees it JVM-side."""
        np_acc, sql_acc = _acc(self.meta.dtype, use="val")
        chunks = self.meta.chunks
        rows_fn = self._rows_fn()
        best = np.argmin if which == "min" else np.argmax

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals, nans, coords = [], [], []
                for pos, arr in rows_fn(pdf):
                    flat = int(best(arr))
                    local = np.unravel_index(flat, arr.shape)
                    v = np_acc.type(arr.flat[flat])
                    vals.append(v)
                    nans.append(bool(v != v))
                    coords.append(
                        [int(sum(chunks[d][: pos[d]]) + local[d]) for d in range(arr.ndim)]
                    )
                yield pd.DataFrame(
                    {
                        "__v": _partial_series(vals, np_acc),
                        "__nan": nans,
                        "coords": coords,
                    }
                )

        partials = self.df.mapInPandas(
            partial, schema=f"__v {sql_acc}, __nan boolean, coords array<int>"
        )
        order = F.col("__v").asc() if which == "min" else F.col("__v").desc()
        if np.issubdtype(self.meta.dtype, np.floating):
            # rebuild the NaN the Arrow hop nulled out; float-only — the
            # when() branch would coerce int64 through double otherwise
            value = F.when(F.col("__nan"), F.lit(float("nan"))).otherwise(F.col("__v"))
        else:
            value = F.col("__v")
        return (
            partials.orderBy(F.col("__nan").desc(), order, F.col("coords").asc())
            .limit(1)
            .select("coords", value.cast(sql_acc).alias("value"))
        )

    def argmin(self) -> DataFrame:
        """Coordinates of the global minimum → one row (coords, value)."""
        return self._arg_extreme("min")

    def argmax(self) -> DataFrame:
        """Coordinates of the global maximum → one row (coords, value)."""
        return self._arg_extreme("max")

    def _axis_arg_extreme(self, axis: int, which: str) -> DataFrame:
        """Shared axis argmin/argmax plan: each chunk reduces to its own
        per-cross-coordinate best (value, global index along the axis);
        the final winner per coordinate is ONE struct-ordered aggregate —
        the shuffle carries reduced vectors only, exactly like
        _axis_reduce.

        Ordering rides a lexicographic struct so ties and NaN follow
        numpy: (nan_key, value, index) under min/max picks NaN rows first
        (numpy's arg* return the first NaN along the axis), then the
        extreme value, then the SMALLEST index (max negates the index to
        keep first-occurrence). NaN markers are explicit booleans because
        the Arrow hop nulls float NaN."""
        ndim = self.meta.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        if ndim < 2:
            raise ValueError("axis_argmin/argmax need ndim >= 2 (use argmin/argmax)")
        kept = [d for d in range(ndim) if d != axis]
        np_acc, sql_acc = _acc(self.meta.dtype, use="val")
        chunks = self.meta.chunks
        rows_fn = self._rows_fn()
        best_fn = np.argmin if which == "min" else np.argmax
        is_f = np_acc.kind == "f"

        def offset(d: int, p: int) -> int:
            return sum(chunks[d][:p])

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                coords_out: list[list[int]] = []
                idx_out: list[int] = []
                val_out: list = []
                nan_out: list[bool] = []
                for pos, arr in rows_fn(pdf):
                    a = arr.astype(np_acc, copy=False)
                    loc = best_fn(a, axis=axis)  # first NaN per numpy
                    val = np.take_along_axis(
                        a, np.expand_dims(loc, axis), axis
                    ).squeeze(axis)
                    gidx = loc + offset(axis, pos[axis])
                    grids = np.indices(val.shape).reshape(len(kept), -1)
                    for j, d_ in enumerate(kept):
                        grids[j] += offset(d_, pos[d_])
                    coords_out.extend(grids.T.tolist())
                    idx_out.extend(int(i) for i in gidx.ravel())
                    flat_vals = val.ravel()
                    if is_f:
                        nans = np.isnan(flat_vals)
                        nan_out.extend(bool(b) for b in nans)
                        # keep the transported value non-null (nan rows all
                        # compare equal on it anyway)
                        flat_vals = np.where(nans, 0.0, flat_vals)
                    else:
                        nan_out.extend([False] * flat_vals.size)
                    val_out.extend(flat_vals.tolist())
                yield pd.DataFrame(
                    {
                        "coords": coords_out,
                        "__v": _partial_series(val_out, np_acc),
                        "__i": pd.Series(idx_out, dtype="int64"),
                        "__nan": nan_out,
                    }
                )

        partials = self.df.mapInPandas(
            partial,
            schema=f"coords array<int>, __v {sql_acc}, __i bigint, __nan boolean",
        )
        if which == "min":
            # min-struct: NaN first (false < true on NOT nan), value asc,
            # index asc — numpy first-occurrence
            key = F.struct(
                (~F.col("__nan")).alias("k0"), F.col("__v").alias("k1"), F.col("__i").alias("k2")
            )
            agg = F.min(key)
        else:
            # max-struct: NaN first (true > false on nan), value desc via
            # max, index negated so the max picks the SMALLEST index
            key = F.struct(
                F.col("__nan").alias("k0"), F.col("__v").alias("k1"), (-F.col("__i")).alias("k2")
            )
            agg = F.max(key)
        won = partials.groupBy("coords").agg(agg.alias("w"))
        idx = F.col("w.k2") if which == "min" else -F.col("w.k2")
        value = (
            F.when(
                F.col("w.k0") != F.lit(which == "min"), F.lit(float("nan"))
            ).otherwise(F.col("w.k1"))
            if is_f
            else F.col("w.k1")
        )
        return won.select(
            "coords", idx.alias("index"), value.cast(sql_acc).alias("value")
        )

    def axis_argmin(self, axis: int) -> DataFrame:
        """Per-coordinate argmin along one axis (dask ``da.argmin(axis)``)
        → one row per surviving coordinate: (coords, index, value)."""
        return self._axis_arg_extreme(axis, "min")

    def axis_argmax(self, axis: int) -> DataFrame:
        """Per-coordinate argmax along one axis → (coords, index, value)."""
        return self._axis_arg_extreme(axis, "max")

    def _complex_moment(self, *, mean: bool) -> DataFrame:
        """sum()/mean() for complex arrays: each chunk's complex128 partial
        ships as an (re, im) double pair with per-component NaN markers
        (the Arrow hop nulls NaN; see _nan_aware); the JVM aggregates each
        component independently — same single-fused-stage plan shape as
        the real-valued path."""
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals, ns = [], []
                for _, arr in rows_fn(pdf):
                    vals.append(arr.sum(dtype=np.complex128))
                    ns.append(arr.size)
                yield pd.DataFrame(
                    {
                        "__re": pd.Series([v.real for v in vals], dtype="float64"),
                        "__im": pd.Series([v.imag for v in vals], dtype="float64"),
                        "__nre": [bool(v.real != v.real) for v in vals],
                        "__nim": [bool(v.imag != v.imag) for v in vals],
                        "__n": pd.Series(ns, dtype="int64"),
                    }
                )

        partials = self.df.mapInPandas(
            partial,
            schema="__re double, __im double, __nre boolean, __nim boolean, __n bigint",
        )
        div = F.sum("__n").cast("double") if mean else F.lit(1.0)
        re = F.when(F.max("__nre"), F.lit(float("nan"))).otherwise(F.sum("__re") / div)
        im = F.when(F.max("__nim"), F.lit(float("nan"))).otherwise(F.sum("__im") / div)
        pre = "mean" if mean else "total"
        return partials.agg(
            re.cast("double").alias(f"{pre}_re"), im.cast("double").alias(f"{pre}_im")
        )

    def mean(self) -> DataFrame:
        """Global mean via sum + count partials (never collects data).
        numpy NaN contract: any NaN → mean is NaN. Complex arrays: two
        columns ``mean_re, mean_im`` (see sum())."""
        if np.dtype(self.meta.dtype).kind == "c":
            return self._complex_moment(mean=True)
        np_acc, sql_acc = _acc(self.meta.dtype)
        rows_fn = self._rows_fn()
        u64 = np_acc == np.uint64

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ss, ns = [], []
                for _, arr in rows_fn(pdf):
                    ss.append(_exact_u64_sum(arr) if u64 else arr.sum(dtype=np_acc))
                    ns.append(arr.size)
                yield pd.DataFrame(
                    {
                        "__s": _partial_series(ss, np_acc),
                        "__n": pd.Series(ns, dtype="int64"),
                        "__nan": [bool(v != v) for v in ss],
                    }
                )

        partials = self.df.mapInPandas(
            partial, schema=f"__s {sql_acc}, __n bigint, __nan boolean"
        )
        mean = _nan_aware(
            np_acc,
            F.sum("__s").cast("double") / F.sum("__n").cast("double"),
            F.max("__nan"),
        )
        return partials.agg(mean.alias("mean_value"))

    def nansum(self) -> DataFrame:
        """dask/numpy ``nansum``: NaN-SKIPPING global sum (an all-NaN
        array sums to 0.0, numpy's contract). Same fused one-Python-stage
        shape as sum(); no NaN transport machinery is needed because the
        partials are NaN-free by construction (np.nansum per chunk), so
        the Arrow hop cannot lose anything. Integer dtypes have no NaN —
        delegates to sum(). Complex arrays follow numpy: an element with
        NaN in EITHER component is skipped entirely (np.isnan on complex),
        and the output keeps sum()'s paired columns total_re/total_im."""
        kind = np.dtype(self.meta.dtype).kind
        if kind == "c":
            return self._complex_nan_moment(mean=False)
        if kind != "f":
            return self.sum()
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals = [
                    float(np.nansum(arr, dtype=np.float64))
                    for _, arr in rows_fn(pdf)
                ]
                yield pd.DataFrame({"__p": pd.Series(vals, dtype="float64")})

        partials = self.df.mapInPandas(partial, schema="__p double")
        return partials.agg(
            F.coalesce(F.sum("__p"), F.lit(0.0)).cast("double").alias("total")
        )

    def _nan_extreme(self, which: str) -> DataFrame:
        """Shared nanmin/nanmax plan: NaN-skipping per-chunk partial →
        tiny final agg. An all-NaN chunk's partial is NaN, which the
        Arrow hop nulls and the JVM MIN/MAX skip — exactly the semantics
        wanted here (unlike min/max, where that silent skip is the bug
        the __nan marker exists to prevent). All partials NaN (all-NaN
        array) → numpy returns NaN, emitted explicitly because Spark's
        empty MIN is NULL."""
        kind = np.dtype(self.meta.dtype).kind
        if kind != "f":
            return self.min() if which == "min" else self.max()
        rows_fn = self._rows_fn()
        np_red = np.nanmin if which == "min" else np.nanmax
        alias = f"{which}_value"

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import warnings

            for pdf in batches:
                vals = []
                for _, arr in rows_fn(pdf):
                    with warnings.catch_warnings():
                        # all-NaN chunk: the RuntimeWarning is the
                        # expected path, the NaN partial is correct
                        warnings.simplefilter("ignore", RuntimeWarning)
                        vals.append(float(np_red(arr)) if arr.size else np.nan)
                yield pd.DataFrame({"__p": pd.Series(vals, dtype="float64")})

        partials = self.df.mapInPandas(partial, schema="__p double")
        agg = F.min("__p") if which == "min" else F.max("__p")
        return partials.agg(
            F.coalesce(agg, F.lit(float("nan"))).cast("double").alias(alias)
        )

    def nanmin(self) -> DataFrame:
        """dask/numpy ``nanmin``: NaN-skipping global minimum (all-NaN →
        NaN). One row, column ``min_value``."""
        return self._nan_extreme("min")

    def nanmax(self) -> DataFrame:
        """dask/numpy ``nanmax``: NaN-skipping global maximum (all-NaN →
        NaN). One row, column ``max_value``."""
        return self._nan_extreme("max")

    def nanmean(self) -> DataFrame:
        """dask/numpy ``nanmean``: mean over non-NaN elements via
        (nansum, non-NaN count) partials. An all-NaN array yields NaN
        (numpy's contract — emitted explicitly because Spark's 0/0 is
        NULL, not NaN). Integer dtypes delegate to mean(); complex arrays
        skip elements with NaN in either component and emit
        mean_re/mean_im."""
        kind = np.dtype(self.meta.dtype).kind
        if kind == "c":
            return self._complex_nan_moment(mean=True)
        if kind != "f":
            return self.mean()
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ss, ns = [], []
                for _, arr in rows_fn(pdf):
                    ss.append(float(np.nansum(arr, dtype=np.float64)))
                    ns.append(int(np.count_nonzero(~np.isnan(arr))))
                yield pd.DataFrame(
                    {
                        "__s": pd.Series(ss, dtype="float64"),
                        "__n": pd.Series(ns, dtype="int64"),
                    }
                )

        partials = self.df.mapInPandas(partial, schema="__s double, __n bigint")
        mean = F.when(
            F.sum("__n") > 0, F.sum("__s") / F.sum("__n").cast("double")
        ).otherwise(F.lit(float("nan")))
        return partials.agg(mean.alias("mean_value"))

    def _complex_nan_moment(self, *, mean: bool) -> DataFrame:
        """NaN-skipping complex sum/mean: np.nansum skips elements whose
        real OR imaginary part is NaN (numpy isnan-on-complex), partials
        travel as paired doubles + a non-NaN count."""
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                re, im, ns = [], [], []
                for _, arr in rows_fn(pdf):
                    tot = np.nansum(arr)
                    re.append(float(tot.real))
                    im.append(float(tot.imag))
                    ns.append(int(np.count_nonzero(~np.isnan(arr))))
                yield pd.DataFrame(
                    {
                        "__re": pd.Series(re, dtype="float64"),
                        "__im": pd.Series(im, dtype="float64"),
                        "__n": pd.Series(ns, dtype="int64"),
                    }
                )

        partials = self.df.mapInPandas(
            partial, schema="__re double, __im double, __n bigint"
        )
        if not mean:
            return partials.agg(
                F.coalesce(F.sum("__re"), F.lit(0.0)).alias("total_re"),
                F.coalesce(F.sum("__im"), F.lit(0.0)).alias("total_im"),
            )
        n = F.sum("__n")
        nanlit = F.lit(float("nan"))
        return partials.agg(
            F.when(n > 0, F.sum("__re") / n.cast("double")).otherwise(nanlit).alias("mean_re"),
            F.when(n > 0, F.sum("__im") / n.cast("double")).otherwise(nanlit).alias("mean_im"),
        )

    def std(self) -> DataFrame:
        """Population standard deviation via (sum, sum-of-squares, count)
        partials — one fused Python stage, three numbers per chunk to the
        JVM. The final expression is written as explicit divide/multiply/
        subtract (no pow/stddev builtins) so any engine computing from the
        same exact partials produces the identical IEEE double."""
        if np.dtype(self.meta.dtype) == np.uint64:
            # sums of squared uint64 need 128-bit accumulation, which
            # neither int64 nor DECIMAL(38,0) can hold exactly; an
            # approximate std is available via astype("float64").std()
            raise TypeError(
                "std() is not supported for uint64 arrays; cast first with "
                'astype("float64") if approximate std is acceptable'
            )
        np_acc, sql_acc = _acc(self.meta.dtype)
        rows_fn = self._rows_fn()

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ss, qq, ns = [], [], []
                for _, arr in rows_fn(pdf):
                    ss.append(arr.sum(dtype=np_acc))
                    qq.append((arr.astype(np_acc) ** 2).sum(dtype=np_acc))
                    ns.append(arr.size)
                yield pd.DataFrame(
                    {
                        "__s": pd.Series(ss, dtype=np_acc),
                        "__q": pd.Series(qq, dtype=np_acc),
                        "__n": pd.Series(ns, dtype="int64"),
                        "__nan": [bool(v != v) for v in ss],
                    }
                )

        partials = self.df.mapInPandas(
            partial, schema=f"__s {sql_acc}, __q {sql_acc}, __n bigint, __nan boolean"
        )
        totals = partials.agg(
            F.sum("__s").alias("s"),
            F.sum("__q").alias("q"),
            F.sum("__n").alias("n"),
            F.max("__nan").alias("has_nan"),
        )
        std = F.expr(
            "sqrt(CAST(q AS DOUBLE) / CAST(n AS DOUBLE) "
            "- (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
            "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
        )
        return totals.select(
            _nan_aware(np_acc, std, F.col("has_nan")).alias("std_value")
        )

    def _axis_reduce(
        self, axis: int, np_red: Callable, final_agg, out_col: str, acc_use: str = "sum"
    ) -> DataFrame:
        """Shared shape of every single-axis reduction: fused pipeline +
        per-chunk numpy partial reduction → explode to (global coords of
        kept dims, partial) → groupBy + final aggregate. The shuffle
        carries only reduced vectors, never chunks.

        Output: one row per surviving global coordinate:
        ``(coords array<int>, <out_col> bigint|double)`` — ``coords`` are
        the global indices of the kept dimensions, in dimension order."""
        ndim = self.meta.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        kept = [d for d in range(ndim) if d != axis]
        np_acc, sql_acc = _acc(self.meta.dtype, use=acc_use)
        chunks = self.meta.chunks  # for global offsets (ragged-safe)
        rows_fn = self._rows_fn()
        u64_sum = np_acc == np.uint64 and acc_use == "sum"

        def offset(d: int, p: int) -> int:
            return sum(chunks[d][:p])

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                coords_out: list[list[int]] = []
                val_out: list = []
                for pos, arr in rows_fn(pdf):
                    if u64_sum:
                        # exact per-chunk axis sums as Python ints — the
                        # uint64 fold must not wrap mod 2^64
                        red = _exact_u64_sum(arr, axis=axis)
                    else:
                        red = np_red(arr.astype(np_acc, copy=False), axis)
                    if not kept:
                        # 1-D array reduced over its only axis: a 0-d
                        # partial with no surviving coordinates — one row
                        # with empty coords per chunk, all grouped into a
                        # single global value (np.indices(()) would raise)
                        coords_out.append([])
                        val_out.append(red if u64_sum else np_acc.type(red))
                        continue
                    grids = np.indices(red.shape).reshape(len(kept), -1)
                    for j, d_ in enumerate(kept):
                        grids[j] += offset(d_, pos[d_])
                    coords_out.extend(grids.T.tolist())
                    val_out.extend(red.ravel())
                yield pd.DataFrame(
                    {
                        "coords": coords_out,
                        "partial": _partial_series(val_out, np_acc),
                        "__nan": [bool(v != v) for v in val_out],
                    }
                )

        partials = self.df.mapInPandas(
            partial, schema=f"coords array<int>, partial {sql_acc}, __nan boolean"
        )
        value = _nan_aware(np_acc, final_agg("partial"), F.max("__nan"))
        return partials.groupBy("coords").agg(value.cast(sql_acc).alias(out_col))

    def axis_sum(self, axis: int) -> DataFrame:
        """Sum along one axis of an N-d grid → (coords, total)."""
        return self._axis_reduce(axis, lambda a, ax: a.sum(axis=ax), F.sum, "total")

    def axis_min(self, axis: int) -> DataFrame:
        """Min along one axis → (coords, value). Partial min per chunk,
        final min across the chunk row of the reduced axis — exact (ints
        widen to int64, float32 to float64, both order-free)."""
        return self._axis_reduce(
            axis, lambda a, ax: a.min(axis=ax), F.min, "value", acc_use="val"
        )

    def axis_max(self, axis: int) -> DataFrame:
        """Max along one axis → (coords, value)."""
        return self._axis_reduce(
            axis, lambda a, ax: a.max(axis=ax), F.max, "value", acc_use="val"
        )

    def axis_mean(self, axis: int) -> DataFrame:
        """Mean along one axis → (coords, value double): the exact axis_sum
        divided by the (constant) global extent of the reduced axis — one
        IEEE division per output element, so integer grids stay
        cross-engine exact."""
        n = self.meta.global_shape[axis]
        return self.axis_sum(axis).select(
            "coords", (F.col("total").cast("double") / F.lit(float(n))).alias("value")
        )

    def axis_std(self, axis: int) -> DataFrame:
        """Population std along one axis (numpy ``a.std(axis)``) →
        (coords, value double): the (sum, sum-of-squares) sufficient
        statistics per surviving coordinate — two fused axis_sum passes
        whose partials are exact for integer grids — combined by the
        explicit sqrt(max(sumsq/n - mean^2, 0)) expression. An oracle
        mirroring the SAME expression over the same exact sums is
        bit-identical; a closed-form variance formula may differ in the
        last ulp.

        Precision limit: the one-pass formula cancels catastrophically
        when |mean| >> std (e.g. values ~1e8 with std ~1e-4): the true
        variance is below the rounding noise of sumsq/n, so the result
        collapses toward 0.0 (numpy's two-pass centered std keeps the
        small-variance digits). The clamp guarantees sqrt never sees a
        rounding-negative variance (no NaN); callers needing
        ill-conditioned accuracy should center the data first
        (``arr - arr.mean()`` via the elementwise ops) and take std of
        the centered array."""
        n = float(self.meta.global_shape[axis])
        sums = self.axis_sum(axis).select(
            "coords", F.col("total").cast("double").alias("__s")
        )
        sq = self.map_numpy(lambda a: a * a)
        sqs = sq.axis_sum(axis).select(
            F.col("coords").alias("c2"), F.col("total").cast("double").alias("__s2")
        )
        joined = sums.join(sqs, sums["coords"] == sqs["c2"])
        mean = F.col("__s") / F.lit(n)
        var = F.greatest(F.col("__s2") / F.lit(n) - mean * mean, F.lit(0.0))
        return joined.select("coords", F.sqrt(var).alias("value"))

    def axis_cumsum(self, axis: int) -> "ChunkedArray":
        """Cumulative sum along one axis — the classic two-pass distributed
        scan, returning a ChunkedArray on the SAME grid (dask
        ``da.cumsum``; accumulator dtype per _acc, so integer grids stay
        exact past 2^53 would-be float rounding).

        Pass 1 (map-only): each chunk emits its axis-total — a reduced
        array of the chunk's CROSS shape, ~1/chunk_extent of the data.
        Pass 2 (tiny shuffle): totals group by cross chunk position —
        groups of nb_chunks[axis] reduced arrays — and an exclusive
        running sum yields each chunk's offset.
        Pass 3: offsets join back to the chunks on pos (the single
        full-data shuffle) and a fused kernel adds local-cumsum + offset.
        At 100×, passes 1-2 move only reduced cross-sections; chunk bodies
        move once, same as any non-co-partitioned binary chunk op."""
        return self._axis_scan(
            axis,
            chunk_reduce=lambda a, ax, acc: a.sum(axis=ax, dtype=acc),
            local_scan=lambda a, ax, acc: a.cumsum(axis=ax, dtype=acc),
            identity=np.zeros,
            combine=lambda local, off: local + off,
        )

    def axis_cumprod(self, axis: int) -> "ChunkedArray":
        """Cumulative product along one axis (dask ``da.cumprod``) — the
        same two-pass distributed scan as axis_cumsum with (×, 1) in
        place of (+, 0): per-chunk axis-products roll into exclusive
        prefix products, then a fused kernel multiplies local-cumprod by
        each chunk's offset. Accumulator dtype follows _acc (ints promote
        to int64 exactly as numpy's cumprod does; int64 overflow wraps —
        numpy semantics; float32 accumulates in float64, the repo's
        standing accumulator contract)."""
        return self._axis_scan(
            axis,
            chunk_reduce=lambda a, ax, acc: a.prod(axis=ax, dtype=acc),
            local_scan=lambda a, ax, acc: a.cumprod(axis=ax, dtype=acc),
            identity=np.ones,
            combine=lambda local, off: local * off,
        )

    def axis_nancumsum(self, axis: int) -> "ChunkedArray":
        """NaN-skipping cumulative sum (numpy ``nancumsum``: NaNs count as
        zero) — the same two-pass scan with NaN-free partials, so nothing
        can vanish across the Arrow hop. Integer dtypes have no NaN —
        identical to axis_cumsum."""
        return self._axis_scan(
            axis,
            chunk_reduce=lambda a, ax, acc: np.nansum(a, axis=ax, dtype=acc),
            local_scan=lambda a, ax, acc: np.nancumsum(a, axis=ax, dtype=acc),
            identity=np.zeros,
            combine=lambda local, off: local + off,
        )

    def axis_nancumprod(self, axis: int) -> "ChunkedArray":
        """NaN-skipping cumulative product (numpy ``nancumprod``: NaNs
        count as one)."""
        return self._axis_scan(
            axis,
            chunk_reduce=lambda a, ax, acc: np.nanprod(a, axis=ax, dtype=acc),
            local_scan=lambda a, ax, acc: np.nancumprod(a, axis=ax, dtype=acc),
            identity=np.ones,
            combine=lambda local, off: local * off,
        )

    def _axis_scan(
        self, axis: int, *, chunk_reduce, local_scan, identity, combine
    ) -> "ChunkedArray":
        """Shared two-pass scan machinery (see axis_cumsum's docstring for
        the distribution shape). ``chunk_reduce(arr, axis, acc_dtype)``
        folds a chunk to its cross-section total, ``identity(shape,
        dtype)`` seeds the exclusive prefix, ``combine`` merges each
        chunk's local scan with its offset cross-section."""
        ndim = self.meta.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        np_acc, _sql_acc = _acc(self.meta.dtype)
        out_dtype = str(np_acc)
        meta = self.meta._replaced(dtype=out_dtype)
        m = self.materialize()
        src = np.dtype(m.meta.dtype)
        name, ts = self.meta.name, self.timestep

        def totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"cross": [], "k": [], "pos": [], "tshape": [], "tot": []}
                for pos, sh, raw in zip(pdf["pos"], pdf["chunk_shape"], pdf["data"]):
                    shape = tuple(int(s) for s in sh)
                    arr = np.frombuffer(raw, dtype=src).reshape(shape)
                    t = np.asarray(chunk_reduce(arr, axis, np_acc))
                    out["cross"].append([int(p) for d, p in enumerate(pos) if d != axis])
                    out["k"].append(int(pos[axis]))
                    out["pos"].append(list(pos))
                    out["tshape"].append(list(t.shape))
                    out["tot"].append(t.tobytes())
                yield pd.DataFrame(out)

        tot_df = m.df.mapInPandas(
            totals,
            schema="cross array<int>, k int, pos array<int>, tshape array<int>, tot binary",
        )

        def prefix(key, pdf: pd.DataFrame) -> pd.DataFrame:
            # chunks at one cross position share their cross shape by grid
            # construction; running-combine their totals in axis order
            pdf = pdf.sort_values("k")
            acc = None
            poss, offs = [], []
            for _, r in pdf.iterrows():
                shape = tuple(int(s) for s in r["tshape"])
                cur = np.frombuffer(bytes(r["tot"]), dtype=np_acc).reshape(shape)
                if acc is None:
                    acc = identity(shape, dtype=np_acc)
                poss.append(list(r["pos"]))
                offs.append(acc.tobytes())
                acc = combine(acc, cur)
            return pd.DataFrame({"pos": poss, "off": offs})

        off_df = tot_df.groupBy("cross").applyInPandas(
            prefix, schema="pos array<int>, off binary"
        )

        joined = m.df.join(
            off_df.select(F.col("pos").alias("__opos"), "off"),
            m.df["pos"] == F.col("__opos"),
        )

        def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, sh, raw, offb in zip(
                    pdf["pos"], pdf["chunk_shape"], pdf["data"], pdf["off"]
                ):
                    shape = tuple(int(s) for s in sh)
                    arr = np.frombuffer(raw, dtype=src).reshape(shape)
                    local = np.asarray(local_scan(arr, axis, np_acc))
                    cross_shape = tuple(s for d, s in enumerate(shape) if d != axis)
                    off = np.frombuffer(bytes(offb), dtype=np_acc).reshape(cross_shape)
                    res = combine(local, np.expand_dims(off, axis))
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(shape))
                    out["data"].append(res.astype(np_acc, copy=False).tobytes())
                yield pd.DataFrame(out)

        df = joined.mapInPandas(final, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def _overlap_join(
        self, blocks: DataFrame, axis: int, depth: int, src, periodic: bool = False
    ) -> DataFrame:
        """One axis's halo exchange over (possibly already-padded) blocks:
        every block emits its leading/trailing ``depth`` slabs keyed to
        the neighbor position that needs them; the slabs pivot to
        (h_before, h_after) columns and LEFT-join back onto the blocks.
        Only the narrow slabs shuffle — 2·depth/extent of each block.
        ``periodic``: grid-edge slabs wrap to the OPPOSITE edge chunk
        (dask boundary='periodic' — simulation wrap-around boundary
        conditions), so every block receives both halos and no numpy
        edge-pad ever fires."""
        meta = self.meta
        nb_axis = meta.nb_chunks_per_dim[axis]

        def halos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"hpos": [], "side": [], "halo": []}
                for pos, sh, raw in zip(pdf["pos"], pdf["chunk_shape"], pdf["data"]):
                    k = int(pos[axis])
                    shape = tuple(int(s) for s in sh)
                    arr = np.frombuffer(raw, dtype=src).reshape(shape)
                    if k > 0 or periodic:
                        # my leading planes: predecessor's tail halo
                        # (wrapping to the last chunk at the grid edge)
                        lead = np.take(arr, range(depth), axis=axis)
                        kk = k - 1 if k > 0 else nb_axis - 1
                        prev = [
                            kk if d == axis else int(p) for d, p in enumerate(pos)
                        ]
                        out["hpos"].append(prev)
                        out["side"].append("after")
                        out["halo"].append(np.ascontiguousarray(lead).tobytes())
                    if k < nb_axis - 1 or periodic:
                        trail = np.take(
                            arr, range(shape[axis] - depth, shape[axis]), axis=axis
                        )
                        kk = k + 1 if k < nb_axis - 1 else 0
                        nxt = [
                            kk if d == axis else int(p) for d, p in enumerate(pos)
                        ]
                        out["hpos"].append(nxt)
                        out["side"].append("before")
                        out["halo"].append(np.ascontiguousarray(trail).tobytes())
                if out["hpos"]:
                    yield pd.DataFrame(out)

        halo_df = blocks.mapInPandas(halos, schema="hpos array<int>, side string, halo binary")
        import pyspark.sql.functions as _F

        pivoted = halo_df.groupBy("hpos").agg(
            _F.max(_F.when(_F.col("side") == "before", _F.col("halo"))).alias("h_before"),
            _F.max(_F.when(_F.col("side") == "after", _F.col("halo"))).alias("h_after"),
        )
        return blocks.join(pivoted, blocks["pos"] == pivoted["hpos"], "left")

    @staticmethod
    def _pad_block(arr, hb, ha, axis: int, depth: int, np_mode: str, src) -> np.ndarray:
        """Assemble one block's padded array along one axis: concatenate
        received halos, numpy-pad the grid edges that had no neighbor."""
        shape = arr.shape
        hshape = tuple(depth if i == axis else s for i, s in enumerate(shape))
        parts = []
        pad_lo = pad_hi = 0
        if hb is not None:
            parts.append(np.frombuffer(bytes(hb), dtype=src).reshape(hshape))
        else:
            pad_lo = depth
        parts.append(arr)
        if ha is not None:
            parts.append(np.frombuffer(bytes(ha), dtype=src).reshape(hshape))
        else:
            pad_hi = depth
        padded = np.concatenate(parts, axis=axis)
        if pad_lo or pad_hi:
            widths = [
                (pad_lo, pad_hi) if d == axis else (0, 0) for d in range(arr.ndim)
            ]
            padded = np.pad(padded, widths, mode=np_mode)
        return padded

    def map_overlap(
        self,
        fn: Callable[[np.ndarray], np.ndarray],
        depth,
        axis: int = 0,
        boundary: str = "nearest",
        persist_blocks: bool = False,
    ) -> "ChunkedArray":
        """dask.array.map_overlap: apply a SHAPE-PRESERVING numpy kernel
        to every chunk padded with halo planes from its neighbors, then
        trim the halos — the general stencil primitive (moving windows,
        convolution, morphological ops, N-d Laplacians) that axis_diff
        special-cases.

        ``depth`` is an int (single axis, selected by ``axis``) or a
        dask-style per-axis dict ``{0: d0, 1: d1}`` — axes with depth 0
        are skipped. Multi-axis overlap composes one halo exchange per
        axis, exactly dask's construction: pass i exchanges slabs of the
        ALREADY-padded blocks, so corner/edge diagonal halos arrive
        transitively through the axis neighbors (a 2-d corner travels
        axis-0 into the row neighbor's pad, then axis-1 into the corner
        cell) — no 3^N-neighbor bookkeeping, and numpy.pad's sequential
        per-axis boundary semantics are matched by construction.

        Halo exchange cost: per axis, each block ships exactly 2 x depth
        slabs (narrow frames keyed to neighbor positions, LEFT-joined
        back); bodies move once per overlap axis (the composition price —
        k axis passes move bodies k times; the slab volume is unchanged).
        ``fn`` runs ONCE, fused into the last axis's assembly stage, so
        the single-axis path keeps its original two-Python-stage shape.
        Grid-edge chunks pad with ``boundary``: 'nearest' (replicate edge
        plane), 'reflect', 'constant' (zeros), or 'periodic' (dask
        wrap-around — edge slabs exchange with the OPPOSITE edge chunk,
        the standard simulation boundary condition; numpy mode 'wrap');
        a dask-style per-axis dict ``{0: 'periodic', 1: 'reflect'}``
        mixes modes (axes default to 'nearest'). Each axis's depth must
        not exceed that axis's smallest chunk extent (dask's constraint:
        halos come from the IMMEDIATE neighbor only). ``fn`` receives the
        padded block and must return an array of the same shape; output
        dtype is coerced back to the array's dtype.

        Recompute vs cache: each axis pass consumes its input blocks
        TWICE (the slab-emit branch and the body that joins the pivoted
        halos back), so by default the producing subtree runs twice per
        axis — bounded memory, the right default when blocks come from a
        cheap scan (staged files, parquet) or a cheap generator.
        ``persist_blocks=True`` caches each pass's input (scoped_persist,
        eagerly materialized — released by the caller's cache_scope, the
        repo's cache-lifecycle convention) so an expensive upstream
        pipeline computes once per pass — dask's shared-graph behavior,
        at one timestep's array of executor storage."""
        ndim = self.meta.ndim
        if isinstance(depth, dict):
            depths = {int(a): int(d) for a, d in depth.items() if int(d) != 0}
        else:
            depths = {axis: int(depth)}
        if not depths:
            raise ValueError("at least one axis needs depth >= 1")
        for ax, d in depths.items():
            if not (0 <= ax < ndim):
                raise ValueError(f"axis {ax} out of range for ndim {ndim}")
            if d < 1:
                raise ValueError("depth must be >= 1")
            if d > min(self.meta.chunks[ax]):
                raise ValueError(
                    f"depth {d} exceeds the smallest axis-{ax} chunk "
                    f"extent {min(self.meta.chunks[ax])}; rechunk first "
                    "(halos come from the immediate neighbor only)"
                )
        if isinstance(boundary, dict):
            boundaries = {int(a): b for a, b in boundary.items()}
        else:
            boundaries = {ax: boundary for ax in depths}
        for ax in depths:
            b = boundaries.setdefault(ax, "nearest")
            if b not in ("nearest", "reflect", "constant", "periodic"):
                raise ValueError(f"unsupported boundary {b!r} for axis {ax}")
        # dask's boundary='reflect' INCLUDES the edge element (numpy mode
        # 'symmetric'); numpy's own 'reflect' excludes it and raises when
        # the pad width equals the block extent. 'periodic' never pads
        # (every block receives both halos via the wrap exchange); 'wrap'
        # is only the defensive numpy analog.
        _NP_MODE = {
            "nearest": "edge",
            "reflect": "symmetric",
            "constant": "constant",
            "periodic": "wrap",
        }
        m = self.materialize()
        src = np.dtype(m.meta.dtype)
        name, ts = self.meta.name, self.timestep
        meta = self.meta
        axes = sorted(depths)
        pad_block = self._pad_block

        def maybe_cache(df: DataFrame) -> DataFrame:
            if not persist_blocks:
                return df
            from doreisa_spark.lifecycle import scoped_persist

            out = scoped_persist(df)
            out.count()  # eager: both consumers below must hit the cache
            return out

        blocks = maybe_cache(m.df)
        # intermediate passes: exchange + assemble padded blocks (no fn)
        for ax in axes[:-1]:
            d = depths[ax]
            np_mode = _NP_MODE[boundaries[ax]]
            joined = self._overlap_join(
                blocks, ax, d, src, boundaries[ax] == "periodic"
            )

            def assemble(batches, _ax=ax, _d=d, _mode=np_mode):
                for pdf in batches:
                    out = {"name": [], "timestep": [], "pos": [],
                           "chunk_shape": [], "data": []}
                    for pos, sh, raw, hb, ha in zip(
                        pdf["pos"], pdf["chunk_shape"], pdf["data"],
                        pdf["h_before"], pdf["h_after"],
                    ):
                        arr = np.frombuffer(raw, dtype=src).reshape(
                            tuple(int(s) for s in sh)
                        )
                        padded = pad_block(arr, hb, ha, _ax, _d, _mode, src)
                        out["name"].append(name)
                        out["timestep"].append(ts)
                        out["pos"].append(list(pos))
                        out["chunk_shape"].append(list(padded.shape))
                        out["data"].append(np.ascontiguousarray(padded).tobytes())
                    if out["pos"]:
                        yield pd.DataFrame(out)

            blocks = maybe_cache(joined.mapInPandas(assemble, schema=CHUNK_SCHEMA))

        last_ax, last_d = axes[-1], depths[axes[-1]]
        last_mode = _NP_MODE[boundaries[last_ax]]
        joined = self._overlap_join(
            blocks, last_ax, last_d, src, boundaries[last_ax] == "periodic"
        )
        chunks_per_axis = {ax: meta.chunks[ax] for ax in axes}

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, sh, raw, hb, ha in zip(
                    pdf["pos"], pdf["chunk_shape"], pdf["data"],
                    pdf["h_before"], pdf["h_after"],
                ):
                    arr = np.frombuffer(raw, dtype=src).reshape(
                        tuple(int(s) for s in sh)
                    )
                    padded = pad_block(arr, hb, ha, last_ax, last_d, last_mode, src)
                    res = np.asarray(fn(padded))
                    if res.shape != padded.shape:
                        raise ValueError(
                            f"map_overlap fn must preserve shape: got {res.shape} "
                            f"for padded {padded.shape}"
                        )
                    for ax in axes:  # trim every axis back to the chunk extent
                        extent = chunks_per_axis[ax][int(pos[ax])]
                        res = np.take(res, range(depths[ax], depths[ax] + extent), axis=ax)
                    res = res.astype(src, copy=False)
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(res.shape))
                    out["data"].append(np.ascontiguousarray(res).tobytes())
                if out["pos"]:
                    yield pd.DataFrame(out)

        df = joined.mapInPandas(kernel, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    def axis_diff(self, axis: int) -> "ChunkedArray":
        """First difference along one axis (numpy ``np.diff`` / the
        finite-difference stencil of in-situ HPC analytics) — a halo
        exchange over the chunk grid.

        Each chunk diffs internally (map-only) and needs exactly ONE halo
        hyperplane — the first slice of its axis-successor — to compute
        its boundary differences. Halos are emitted keyed to the
        predecessor position (a narrow frame: 1/chunk_extent of the data)
        and LEFT-joined back; chunk bodies themselves never move twice.
        Output dtype follows numpy (diff of intN stays intN, wrap
        semantics included); the axis extent shrinks by one, absorbed by
        the last chunk (which drops out entirely when its extent was 1)."""
        ndim = self.meta.ndim
        if not (0 <= axis < ndim):
            raise ValueError(f"axis {axis} out of range for ndim {ndim}")
        if self.meta.global_shape[axis] < 2:
            raise ValueError("axis extent must be >= 2 to diff")
        old_sizes = self.meta.chunks[axis]
        n_axis = len(old_sizes)
        new_sizes = old_sizes[:-1] + (old_sizes[-1] - 1,)
        drop_last = new_sizes[-1] == 0
        if drop_last:
            new_sizes = new_sizes[:-1]
        new_chunks = tuple(
            new_sizes if d == axis else sizes for d, sizes in enumerate(self.meta.chunks)
        )
        nb = tuple(
            len(new_sizes) if d == axis else n
            for d, n in enumerate(self.meta.nb_chunks_per_dim)
        )
        meta = self.meta._replaced(nb_chunks_per_dim=nb, chunk_shape=new_chunks)
        m = self.materialize()
        src = np.dtype(m.meta.dtype)
        name, ts = self.meta.name, self.timestep

        def halos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"hpos": [], "halo": []}
                for pos, sh, raw in zip(pdf["pos"], pdf["chunk_shape"], pdf["data"]):
                    k = int(pos[axis])
                    if k == 0:
                        continue
                    shape = tuple(int(s) for s in sh)
                    arr = np.frombuffer(raw, dtype=src).reshape(shape)
                    first = np.take(arr, [0], axis=axis)  # successor's leading plane
                    prev = [int(p) - (1 if d == axis else 0) for d, p in enumerate(pos)]
                    out["hpos"].append(prev)
                    out["halo"].append(np.ascontiguousarray(first).tobytes())
                if out["hpos"]:  # an empty frame's columns would arrive
                    yield pd.DataFrame(out)  # float64-typed and break Arrow

        halo_df = m.df.mapInPandas(halos, schema="hpos array<int>, halo binary")
        joined = m.df.join(halo_df, m.df["pos"] == halo_df["hpos"], "left")

        def stencil(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"name": [], "timestep": [], "pos": [], "chunk_shape": [], "data": []}
                for pos, sh, raw, hb in zip(
                    pdf["pos"], pdf["chunk_shape"], pdf["data"], pdf["halo"]
                ):
                    shape = tuple(int(s) for s in sh)
                    arr = np.frombuffer(raw, dtype=src).reshape(shape)
                    d = np.diff(arr, axis=axis)
                    if hb is not None:
                        hshape = tuple(1 if i == axis else s for i, s in enumerate(shape))
                        halo = np.frombuffer(bytes(hb), dtype=src).reshape(hshape)
                        boundary = halo - np.take(arr, [-1], axis=axis)
                        d = np.concatenate([d, boundary], axis=axis)
                    elif d.shape[axis] == 0:
                        continue  # trailing size-1 chunk: nothing to emit
                    out["name"].append(name)
                    out["timestep"].append(ts)
                    out["pos"].append(list(pos))
                    out["chunk_shape"].append(list(d.shape))
                    out["data"].append(np.ascontiguousarray(d).tobytes())
                if out["pos"]:
                    yield pd.DataFrame(out)

        df = joined.mapInPandas(stencil, schema=CHUNK_SCHEMA)
        return ChunkedArray(df, meta, ts)

    # -------------------------------------------------------------- utility
    def persist(self) -> "ChunkedArray":
        """Async materialization analog of doreisa's ray_persist
        (_scheduler.py:114-117): flushes the pending pipeline so the cached
        bytes are post-kernel, then lazy until first action."""
        m = self.materialize()
        return ChunkedArray(m.df.persist(), m.meta, m.timestep)

    def unpersist(self) -> "ChunkedArray":
        self.df.unpersist()
        return self

    def to_numpy(self) -> np.ndarray:
        """TEST-ONLY driver materialization of the full array."""
        m = self.materialize()
        dtype = np.dtype(m.meta.dtype)
        out = np.zeros(m.meta.global_shape, dtype=dtype)
        for row in m.df.collect():
            pos = tuple(row["pos"])
            off = m.meta.offset_of(pos)
            shape = tuple(row["chunk_shape"])
            slices = tuple(slice(o, o + s) for o, s in zip(off, shape))
            out[slices] = np.frombuffer(row["data"], dtype=dtype).reshape(shape)
        return out

    def count_chunks(self) -> int:
        return self.df.count()


def expected_sum_arithmetic(meta: GridMeta) -> float:
    """Closed-form oracle helper for the r+c test grid (tests use this the
    way the reference uses closed-form sums, tests/test_doreisa.py:18-21)."""
    rows, cols = meta.global_shape
    return float(cols * (rows * (rows - 1)) / 2 + rows * (cols * (cols - 1)) / 2)


def ramp_chunk(pos: tuple[int, ...], shape: tuple[int, ...]) -> np.ndarray:
    """Standard test chunk: element value = sum of its GLOBAL coordinates
    (for 2-D: A[r, c] = r + c). Deterministic, integer-valued → exact in
    float64 and in any SQL oracle. Uniform grids only (global offset =
    pos * shape); ragged tests build chunks explicitly."""
    grids = np.ix_(
        *[np.arange(p * s, (p + 1) * s, dtype=np.float64) for p, s in zip(pos, shape)]
    )
    return sum(grids)  # open (broadcasting) grids: one output allocation

"""The ``run_simulation`` analog: per-timestep micro-batch ingest of chunk
grids, sliding windows over timesteps, and a user analytics callback.

Reference semantics mirrored (citations for parity checking):

- ``ArrayDefinition(name, window_size, preprocess)`` — the stream's schema
  declaration (doreisa/window_api.py:14-18, doreisa/head_node.py:27-34).
- Producers contribute one chunk per (array, timestep) and block when the
  analytics side is behind (doreisa/simulation_node.py:35-74 blocks on
  ``ray.get``; here ``Ingest.add_chunk`` blocks on a bounded queue —
  the same backpressure contract as head_node.py:189-205's semaphore).
- ``preprocess`` runs per chunk at ingest, before anything else sees the
  data (simulation_node.py:57).
- The callback fires for iteration *i* only when ALL declared arrays for
  *i* have arrived; out-of-order timesteps are buffered
  (window_api.py:75-85 ``arrays_by_iteration``).
- ``window_size=W`` hands the callback the last W arrays, fewer at stream
  start (window_api.py:88-97); eviction after each iteration
  (window_api.py:105-114) maps to ``unpersist``.
- ``prepare_iteration`` + ``preparation_advance`` — plan-ahead work
  launched before the iteration's data exists (window_api.py:21-35,58-72;
  head_node.py:318-327). In Spark, *plans* are free (lazy); what we run
  ahead is the user's preparation callable on a metadata-only descriptor,
  on a background thread pool.

Scale posture: each timestep's grid is a DataFrame whose rows (chunks)
live on executors; the driver holds only grid metadata and DataFrame
handles — exactly the head-node-holds-only-refs design of the reference.
At 100 TB/day of simulation output, ingest becomes a streaming file
source (producers drop chunk parquet per timestep); the driver loop and
window semantics below are unchanged — see ``from_staged_timesteps``.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable, Hashable, Iterator, Mapping
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import SparkSession

from doreisa_spark.plans.chunked import ChunkedArray, GridMeta

# Timesteps are opaque hashable keys, as in the reference
# (doreisa/__init__.py:1-5 ``Timestep = Hashable``): ints, floats, tuples
# like (run_id, t) — anything a simulation keys its steps by. Internally
# each key maps to an integer ORDINAL (ints map to themselves, preserving
# out-of-order buffering by value; other keys get arrival order), which is
# what the chunk rows' bigint ``timestep`` column and the driver's
# iteration loop use; callbacks receive the original key.
Timestep = Hashable


@dataclass(frozen=True)
class ArrayDefinition:
    """Declaration of one chunked-array stream (window_api.py:14-18)."""

    name: str
    window_size: int | None = None
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None


@dataclass
class _PendingTimestep:
    """Chunks received so far for one (array, timestep) — the analog of
    _scheduling_actor.py's _ArrayTimestep accumulation state."""

    chunks: dict[tuple[int, ...], np.ndarray] = field(default_factory=dict)
    nb_chunks: int | None = None  # total expected, from the producer


class Ingest:
    """Producer-side API: ``add_chunk`` accumulates chunks per
    (array, timestep) and emits a complete grid when all chunks arrived.

    Thread-safe: simulation ranks are threads here (MPI processes in the
    reference). ``max_pending_arrays`` bounds completed-but-unconsumed
    grids; producers block once it is reached — the reference's
    backpressure semaphore (head_node.py:189-205).
    """

    def __init__(self, spark: SparkSession, *, max_pending_arrays: int = 4):
        self._spark = spark
        self._lock = threading.Lock()
        self._pending: dict[tuple[str, Timestep], _PendingTimestep] = {}
        self._metas: dict[str, GridMeta] = {}
        self._ready: queue.Queue[tuple[str, Timestep, ChunkedArray]] = queue.Queue(
            maxsize=max_pending_arrays
        )
        self._preprocess: dict[str, Callable[[np.ndarray], np.ndarray]] = {}
        self._ordinals: dict[Timestep, int] = {}
        self._next_ordinal = 0

    def ordinal_of(self, timestep: Timestep) -> int:
        """Integer ordinal for an opaque timestep key. Int keys are their
        own ordinal (out-of-order arrivals buffer by value, matching the
        reference's per-iteration dict); any other hashable is numbered in
        first-arrival order, shared across arrays so one iteration's
        arrays line up. A simulation should use one key style, not mix."""
        if isinstance(timestep, (int, np.integer)) and not isinstance(timestep, bool):
            return int(timestep)
        with self._lock:
            if timestep not in self._ordinals:
                self._ordinals[timestep] = self._next_ordinal
                self._next_ordinal += 1
            return self._ordinals[timestep]

    def set_preprocess(self, name: str, fn: Callable[[np.ndarray], np.ndarray]) -> None:
        self._preprocess[name] = fn

    def add_chunk(
        self,
        array_name: str,
        chunk_position: tuple[int, ...],
        nb_chunks_per_dim: tuple[int, ...],
        timestep: Timestep,
        chunk: np.ndarray,
    ) -> None:
        """Contribute one chunk; blocks if analytics is behind
        (simulation_node.py:35-74 + head_node.py:281-299 semantics)."""
        fn = self._preprocess.get(array_name)
        if fn is not None:
            chunk = np.asarray(fn(chunk))
        if chunk.dtype == np.float16:
            # half-precision producers: exact widening to float32 at the
            # ingest boundary (the documented float16 contract — the frozen
            # meta and all analytics run in float32)
            chunk = chunk.astype(np.float32)
        ordinal = self.ordinal_of(timestep)  # before _lock: takes _lock itself
        complete: ChunkedArray | None = None
        with self._lock:
            key = (array_name, timestep)
            # dtype/shape inference-then-freeze (head_node.py:80-100).
            # All validation happens BEFORE any state mutation so a
            # rejected chunk leaves the ingest consistent.
            meta = self._metas.get(array_name)
            if meta is not None:
                # frozen after the first completed timestep; tiling may be
                # ragged (head_node.py:53,157-162), so the expected shape is
                # looked up per grid position
                if meta.nb_chunks_per_dim != tuple(nb_chunks_per_dim):
                    raise ValueError(f"{array_name}: grid changed across timesteps")
                if meta.shape_of(tuple(chunk_position)) != chunk.shape:
                    raise ValueError(f"{array_name}: chunk shape changed")
                if meta.dtype != str(chunk.dtype):
                    raise ValueError(f"{array_name}: dtype changed")
            pend = self._pending.get(key) or _PendingTimestep()
            nb_total = int(np.prod(nb_chunks_per_dim))
            if pend.nb_chunks is None:
                pend.nb_chunks = nb_total
            elif pend.nb_chunks != nb_total:
                raise ValueError(f"{key}: inconsistent grid {nb_chunks_per_dim}")
            if chunk_position in pend.chunks:
                raise ValueError(f"{key}: duplicate chunk at {chunk_position}")
            self._pending[key] = pend
            pend.chunks[chunk_position] = chunk
            if len(pend.chunks) == pend.nb_chunks:
                # from_numpy_chunks infers (possibly ragged) tiling and
                # validates within-timestep consistency; freeze it for all
                # later timesteps (head_node.py:80-100 infer-then-enforce)
                arr = ChunkedArray.from_numpy_chunks(
                    self._spark, array_name, pend.chunks, timestep=ordinal
                )
                self._metas.setdefault(array_name, arr.meta)
                del self._pending[key]
                complete = arr
        if complete is not None:
            # blocks when max_pending_arrays grids await consumption
            self._ready.put((array_name, timestep, complete))

    def get_next_array(
        self, timeout: float | None = None
    ) -> tuple[str, Timestep, ChunkedArray]:
        """FIFO of completed grids (head_node.py:313-316)."""
        return self._ready.get(timeout=timeout)


@dataclass(frozen=True)
class PreparedIteration:
    """Metadata-only descriptor handed to ``prepare_iteration`` before the
    iteration's data exists (head_node.py:318-327 builds the same: an array
    with no ObjectRefs)."""

    name: str
    timestep: int


class SimulationDriver:
    """The driver loop of ``run_simulation`` (window_api.py:38-119)."""

    def __init__(
        self,
        spark: SparkSession,
        definitions: list[ArrayDefinition],
        *,
        max_pending_arrays: int | None = None,
        prepare_iteration: Callable[[PreparedIteration], object] | None = None,
        preparation_advance: int = 3,
    ):
        if max_pending_arrays is None:
            # reference default: 2 arrays in flight per definition
            # (window_api.py:46-52)
            max_pending_arrays = 2 * len(definitions)
        self.spark = spark
        self.definitions = {d.name: d for d in definitions}
        self.ingest = Ingest(spark, max_pending_arrays=max_pending_arrays)
        for d in definitions:
            if d.preprocess is not None:
                self.ingest.set_preprocess(d.name, d.preprocess)
        self._prepare = prepare_iteration
        self._advance = preparation_advance
        self._pool = ThreadPoolExecutor(max_workers=max(1, preparation_advance or 1))

    def run(
        self,
        callback: Callable[..., None],
        *,
        max_iterations: int,
        iteration_timeout: float | None = 120.0,
    ) -> None:
        """Consume timesteps 0..max_iterations-1, invoking ``callback`` once
        per iteration with one kwarg per declared array: the ChunkedArray
        (window_size None) or the list of the last W ChunkedArrays
        (window_size W, shorter at stream start) plus ``timestep=`` and,
        when preparation is enabled, ``preparation_result=``.
        """
        windows: dict[str, list[ChunkedArray]] = {n: [] for n in self.definitions}
        # out-of-order arrival buffer (window_api.py:75-85), keyed by the
        # integer ordinal; the original (possibly opaque) timestep key is
        # kept alongside and handed to the callback
        by_iteration: dict[int, dict[str, ChunkedArray]] = {}
        keys: dict[int, Timestep] = {}
        prepared: dict[int, Future] = {}

        def launch_prepare(ts: int) -> None:
            if self._prepare is not None and ts < max_iterations:
                first_name = next(iter(self.definitions))
                desc = PreparedIteration(first_name, ts)
                prepared[ts] = self._pool.submit(self._prepare, desc)

        # seed iterations 0..advance-1 before any data exists
        # (window_api.py:58-64); iteration i then launches i+advance at its
        # TOP — before consuming i — so every iteration's preparation is
        # launched ahead of its consumption even when advance == 0
        # (window_api.py:66-72 launches before the ray.get of iteration i).
        for ts in range(min(self._advance, max_iterations)):
            launch_prepare(ts)

        for it in range(max_iterations):
            launch_prepare(it + self._advance)
            while it not in by_iteration or len(by_iteration[it]) < len(self.definitions):
                # timeout guards against a dead producer (a raise in the
                # producer thread) deadlocking the loop
                name, ts, arr = self.ingest.get_next_array(timeout=iteration_timeout)
                o = self.ingest.ordinal_of(ts)
                keys[o] = ts
                by_iteration.setdefault(o, {})[name] = arr
            arrays = by_iteration.pop(it)

            kwargs: dict[str, object] = {"timestep": keys.pop(it, it)}
            for name, d in self.definitions.items():
                arr = arrays[name].persist()
                if d.window_size is None:
                    kwargs[name] = arr
                else:
                    win = windows[name]
                    win.append(arr)
                    kwargs[name] = list(win[-d.window_size :])
            if self._prepare is not None:
                fut = prepared.pop(it, None)
                kwargs["preparation_result"] = fut.result() if fut is not None else None

            callback(**kwargs)

            # window eviction + eager release (window_api.py:105-119 →
            # unpersist; ContextCleaner does the distributed GC).
            # After iteration i only the last W-1 arrays are part of any
            # future window; everything older is released now.
            for name, d in self.definitions.items():
                if d.window_size is None:
                    arrays[name].unpersist()
                    continue
                win = windows[name]
                keep = max(d.window_size - 1, 0)
                evict, windows[name] = win[: len(win) - keep], win[len(win) - keep :]
                for old in evict:
                    old.unpersist()

    def shutdown(self) -> None:
        self._pool.shutdown(wait=False)


def run_simulation(
    spark: SparkSession,
    simulation_callback: Callable[..., None],
    arrays_description: list[ArrayDefinition],
    *,
    max_iterations: int,
    producers: Callable[[Ingest], None] | None = None,
    prepare_iteration: Callable[[PreparedIteration], object] | None = None,
    preparation_advance: int = 0,
) -> None:
    """One-call API mirroring doreisa's ``run_simulation``
    (window_api.py:38-119). ``producers`` receives the Ingest handle and
    runs on a background thread (the simulation side)."""
    driver = SimulationDriver(
        spark,
        arrays_description,
        prepare_iteration=prepare_iteration,
        preparation_advance=preparation_advance,
    )
    thread = None
    if producers is not None:
        thread = threading.Thread(target=producers, args=(driver.ingest,), daemon=True)
        thread.start()
    try:
        driver.run(simulation_callback, max_iterations=max_iterations)
    finally:
        driver.shutdown()
        if thread is not None:
            thread.join(timeout=30)


def staged_timestep_reader(
    spark: SparkSession, staging_dir: str, meta: GridMeta
) -> Iterator[tuple[int, ChunkedArray]]:
    """Scale-path ingest: producers drop one parquet of chunk rows per
    timestep under ``staging_dir/ts=<N>/``; this generator yields complete
    timesteps in order. The 100 TB analog of Ingest.add_chunk — data never
    passes through the driver (files are written where they are produced,
    read by executors).

    Directory-per-timestep is the micro-batch boundary: a timestep is
    visible only once its ``_SUCCESS`` marker exists (the barrier of
    head_node.py:102-118).
    """
    import os
    import re
    import time as _time

    seen = 0
    while True:
        candidates: Mapping[int, str] = {
            int(m.group(1)): os.path.join(staging_dir, d)
            for d in (os.listdir(staging_dir) if os.path.isdir(staging_dir) else [])
            if (m := re.fullmatch(r"ts=(\d+)", d))
        }
        if seen in candidates and os.path.exists(os.path.join(candidates[seen], "_SUCCESS")):
            df = spark.read.parquet(candidates[seen])
            yield seen, ChunkedArray(df, meta, seen)
            seen += 1
            continue
        if candidates and max(candidates) < seen:
            return
        _time.sleep(0.05)

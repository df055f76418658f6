"""Custom Python DataSource (Spark 4 DataSource API): simulation chunk
grids as a first-class readable format.

``spark.read.format("doreisa_chunks")`` materializes the chunk-row schema
of plans/chunked.py straight from the executors — the engine-native way to
expose "a running simulation" to Spark, complementing the driver-side
``Ingest`` path (streaming/simulation.py) and the staged-parquet path.

Partition planning is explicit: ONE InputPartition per chunk, so Spark
schedules chunk generation with the same granularity doreisa schedules
per-chunk tasks (reference: one Ray task per chunk,
doreisa/_scheduling_actor.py:149-171), and `spark.read` parallelism equals
the grid size with zero driver-side data.

Chunk content comes from a named KERNEL registry: a producer registers a
``(pos, shape, timestep) -> ndarray`` callable under a name and selects
it with ``option("expr", name)`` — the callable is resolved driver-side
at plan time and shipped to executors inside the (cloudpickled) reader,
so ``spark.read.format("doreisa_chunks")`` can expose a real producer's
generator, not just the built-in demo ramp.

Supported options: ``grid`` ("4,4"), ``chunk`` ("64,64"), ``dtype``
(numpy name), ``timestep`` (int), ``name`` (array name — or a
comma-separated list to multiplex SEVERAL named arrays through one
read/stream), ``expr`` (kernel name; built-ins: "ramp" — element = sum of
global coordinates — and "ramp_t" — (t+1)·ramp), ``expr.<name>``
(per-array kernel override when multiplexing). Streaming adds
``max_timesteps`` and ``timesteps_per_trigger`` and defaults ``expr`` to
"ramp_t".

Multi-array semantics mirror the reference's several-arrays sync
(reference: tests/test_several_arrays.py:17-40 — arrays "a" and "b"
produced per iteration, callback sees BOTH at each timestep): every
streaming micro-batch carries the chunks of ALL named arrays for its
timestep(s), so the per-iteration barrier closes over every array, and
consumers split by the ``name`` column.
"""

from __future__ import annotations

from collections.abc import Callable
from itertools import product

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from doreisa_spark.plans.chunked import CHUNK_SCHEMA, ramp_chunk

# kernel: (pos, shape, timestep) -> ndarray of the chunk's content.
ChunkKernel = Callable[[tuple[int, ...], tuple[int, ...], int], np.ndarray]

KERNELS: dict[str, ChunkKernel] = {}


def register_kernel(name: str, fn: ChunkKernel) -> None:
    """Expose a producer's chunk generator to format("doreisa_chunks").

    A plain ``option("expr", name)`` resolves in the Python data-source
    worker process, so it only finds kernels this module registers at
    import time (built-ins, or a producer package imported on every
    node). For a kernel registered dynamically in the driver process,
    pass ``option("expr", kernel_expr(name))`` — the callable travels
    cloudpickled inside the option string."""
    KERNELS[name] = fn


def kernel_expr(name: str) -> str:
    """Self-contained ``expr`` option value for a driver-registered
    kernel: "pickle:<base64 cloudpickle>". Use when the kernel is not
    importable on the worker side (e.g. defined in a script/test)."""
    import base64

    from pyspark import cloudpickle

    return "pickle:" + base64.b64encode(cloudpickle.dumps(KERNELS[name])).decode()


def _resolve_kernel(expr: str) -> ChunkKernel:
    if expr.startswith("pickle:"):
        import base64

        from pyspark import cloudpickle

        return cloudpickle.loads(base64.b64decode(expr[len("pickle:"):]))
    if expr not in KERNELS:
        raise ValueError(
            f"unknown chunk kernel {expr!r}; registered: {sorted(KERNELS)}"
        )
    return KERNELS[expr]


def _ramp(pos: tuple[int, ...], shape: tuple[int, ...], ts: int) -> np.ndarray:
    return ramp_chunk(pos, shape)


def _ramp_t(pos: tuple[int, ...], shape: tuple[int, ...], ts: int) -> np.ndarray:
    # per-timestep content scaling with the iteration, as in the
    # reference's tests (tests/utils.py:26-47)
    return float(ts + 1) * ramp_chunk(pos, shape)


register_kernel("ramp", _ramp)
register_kernel("ramp_t", _ramp_t)


class ChunkInputPartition(InputPartition):
    def __init__(self, pos: tuple[int, ...], name: str = "grid"):
        self.pos = pos
        self.name = name


class ChunkGridReader(DataSourceReader):
    def __init__(self, options, *, default_expr: str = "ramp"):
        self.grid = tuple(int(x) for x in options.get("grid", "4,4").split(","))
        self.chunk = tuple(int(x) for x in options.get("chunk", "64,64").split(","))
        if len(self.grid) != len(self.chunk):
            raise ValueError(f"grid {self.grid} and chunk {self.chunk} rank mismatch")
        self.dtype = options.get("dtype", "float64")
        self.timestep = int(options.get("timestep", "0"))
        self.names = [n.strip() for n in options.get("name", "grid").split(",")]
        # kernels resolved at plan time so the callables ride to the
        # executors inside the pickled reader; expr.<name> overrides the
        # shared expr per array (several-arrays multiplexing)
        shared = options.get("expr", default_expr)
        self.kernels: dict[str, ChunkKernel] = {
            n: _resolve_kernel(options.get(f"expr.{n}", shared)) for n in self.names
        }

    def _chunk_bytes(
        self, name: str, pos: tuple[int, ...], ts: int
    ) -> tuple[tuple[int, ...], bytes]:
        arr = np.asarray(self.kernels[name](pos, self.chunk, ts)).astype(
            np.dtype(self.dtype), copy=False
        )
        if arr.shape != self.chunk:
            raise ValueError(
                f"kernel returned shape {arr.shape} for chunk shape {self.chunk}"
            )
        return arr.shape, arr.tobytes()

    def partitions(self):
        return [
            ChunkInputPartition(p, n)
            for n in self.names
            for p in product(*(range(g) for g in self.grid))
        ]

    def read(self, partition: ChunkInputPartition):
        pos = partition.pos
        shape, data = self._chunk_bytes(partition.name, pos, self.timestep)
        yield (partition.name, self.timestep, list(pos), list(shape), data)


class ChunkStreamReader(DataSourceStreamReader):
    """Streaming variant: ONE micro-batch per simulation timestep — the
    reference's array-completion barrier (doreisa/head_node.py:102-118)
    expressed as a Structured Streaming source. Offsets are timestep
    numbers, so restart/recovery replays exactly the timesteps after the
    checkpointed offset; ``max_timesteps`` bounds the stream for
    availableNow drains."""

    def __init__(self, options):
        self._inner = ChunkGridReader(options, default_expr="ramp_t")
        self.max_timesteps = int(options.get("max_timesteps", "3"))
        # backpressure knob (maxFilesPerTrigger analog; doreisa's
        # max_pending_arrays): how many timesteps each trigger may admit.
        # 0 = unbounded (availableNow drains everything in one batch).
        self.per_trigger = int(options.get("timesteps_per_trigger", "0"))
        self._latest = 0
        # highest offset the ENGINE has revealed (planned batch start/end
        # or committed end). On restart from a checkpoint this snaps to
        # the checkpoint position at the first partitions() call, so
        # latestOffset can never keep offering offsets below the restored
        # start (which showed up as stalled empty batches). The advance in
        # latestOffset stays monotone-per-trigger so a restart where
        # everything was committed (engine reveals nothing) still catches
        # up instead of stalling.
        self._floor = 0

    def initialOffset(self):
        return {"timestep": 0}

    def latestOffset(self):
        if self.per_trigger <= 0:
            self._latest = self.max_timesteps
        else:
            self._latest = min(
                max(self._latest, self._floor) + self.per_trigger,
                self.max_timesteps,
            )
        return {"timestep": self._latest}

    def partitions(self, start, end):
        self._floor = max(self._floor, start["timestep"], end["timestep"])
        # one micro-batch per timestep: [start, end) timesteps, each with
        # one InputPartition per chunk PER ARRAY (the several-arrays
        # barrier: a timestep's batch is complete only with every named
        # array's full grid in it)
        parts = []
        for ts in range(start["timestep"], end["timestep"]):
            for name in self._inner.names:
                for pos in product(*(range(n) for n in self._inner.grid)):
                    parts.append(ChunkInputPartition((ts,) + pos, name))
        return parts

    def read(self, partition: ChunkInputPartition):
        ts, pos = partition.pos[0], partition.pos[1:]
        shape, data = self._inner._chunk_bytes(partition.name, pos, ts)
        yield (partition.name, ts, list(pos), list(shape), data)

    def commit(self, end):
        self._floor = max(self._floor, end["timestep"])


class ChunkDataSource(DataSource):
    """format("doreisa_chunks") entry point (batch + streaming)."""

    @classmethod
    def name(cls) -> str:
        return "doreisa_chunks"

    def schema(self) -> str:
        return CHUNK_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return ChunkGridReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return ChunkStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ChunkDataSource)

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

Supported options: ``grid`` ("4,4"), ``chunk`` ("64,64"), ``dtype``
(numpy name), ``timestep`` (int), ``name`` (array name), ``expr``
(chunk content: only "ramp" — element = sum of global coordinates —
matching ramp_chunk; user kernels belong in ChunkedArray.map_numpy).
"""

from __future__ import annotations

from itertools import product

import numpy as np

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from doreisa_spark.plans.chunked import CHUNK_SCHEMA


class ChunkInputPartition(InputPartition):
    def __init__(self, pos: tuple[int, ...]):
        self.pos = pos


class ChunkGridReader(DataSourceReader):
    def __init__(self, options):
        self.grid = tuple(int(x) for x in options.get("grid", "4,4").split(","))
        self.chunk = tuple(int(x) for x in options.get("chunk", "64,64").split(","))
        if len(self.grid) != len(self.chunk):
            raise ValueError(f"grid {self.grid} and chunk {self.chunk} rank mismatch")
        self.dtype = options.get("dtype", "float64")
        self.timestep = int(options.get("timestep", "0"))
        self.name = options.get("name", "grid")
        expr = options.get("expr", "ramp")
        if expr != "ramp":
            raise ValueError(f"unknown chunk expr {expr!r}")

    def partitions(self):
        return [
            ChunkInputPartition(p) for p in product(*(range(n) for n in self.grid))
        ]

    def read(self, partition: ChunkInputPartition):
        pos = partition.pos
        dtype = np.dtype(self.dtype)
        grids = np.ix_(
            *[
                np.arange(p * s, (p + 1) * s, dtype=np.float64)
                for p, s in zip(pos, self.chunk)
            ]
        )
        arr = sum(grids).astype(dtype, copy=False)
        yield (
            self.name,
            self.timestep,
            list(pos),
            list(arr.shape),
            arr.tobytes(),
        )


class ChunkStreamReader(DataSourceStreamReader):
    """Streaming variant: ONE micro-batch per simulation timestep — the
    reference's array-completion barrier (doreisa/head_node.py:102-118)
    expressed as a Structured Streaming source. Offsets are timestep
    numbers, so restart/recovery replays exactly the timesteps after the
    checkpointed offset; ``max_timesteps`` bounds the stream for
    availableNow drains."""

    def __init__(self, options):
        self._inner = ChunkGridReader(options)
        self.max_timesteps = int(options.get("max_timesteps", "3"))
        # backpressure knob (maxFilesPerTrigger analog; doreisa's
        # max_pending_arrays): how many timesteps each trigger may admit.
        # 0 = unbounded (availableNow drains everything in one batch).
        self.per_trigger = int(options.get("timesteps_per_trigger", "0"))
        self._latest = 0

    def initialOffset(self):
        return {"timestep": 0}

    def latestOffset(self):
        if self.per_trigger <= 0:
            self._latest = self.max_timesteps
        else:
            self._latest = min(self._latest + self.per_trigger, self.max_timesteps)
        return {"timestep": self._latest}

    def partitions(self, start, end):
        # one micro-batch per timestep: [start, end) timesteps, each with
        # one InputPartition per chunk (same granularity as batch)
        parts = []
        for ts in range(start["timestep"], end["timestep"]):
            for pos in product(*(range(n) for n in self._inner.grid)):
                parts.append(ChunkInputPartition((ts,) + pos))
        return parts

    def read(self, partition: ChunkInputPartition):
        # per-timestep content: (t+1)·ramp — matches the reference's tests
        # where chunk values scale with the iteration (tests/utils.py:26-47)
        ts, pos = partition.pos[0], partition.pos[1:]
        inner = self._inner
        dtype = np.dtype(inner.dtype)
        grids = np.ix_(
            *[
                np.arange(p * s, (p + 1) * s, dtype=np.float64)
                for p, s in zip(pos, inner.chunk)
            ]
        )
        arr = (float(ts + 1) * sum(grids)).astype(dtype, copy=False)
        yield (inner.name, ts, list(pos), list(arr.shape), arr.tobytes())

    def commit(self, end):
        pass


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

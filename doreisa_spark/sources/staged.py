"""Binary-staged chunk ingest — the high-throughput producer→Spark path.

The custom Python DataSource (chunk_source.py) is the CONTROL-plane ingest:
convenient, exactly-one-batch-per-timestep, but every chunk byte crosses a
Python datasource worker (measured ~122 MiB/s end-to-end, BASELINE.md
streaming section). A real HPC feed — the reference's producers push binary
chunks at Ray-object-store speed via zero-copy ``ray.put``
(/root/reference/doreisa/simulation_node.py:60) — needs a DATA plane with
zero per-element Python:

- **producer side**: ``write_chunk`` dumps each chunk's raw C-order bytes
  to one file per chunk under a per-timestep directory (atomic tmp+rename,
  so a concurrent reader never sees a torn file); ``seal_timestep`` drops
  the ``_COMPLETE`` marker once every chunk of the step landed — the
  array-completion barrier (reference: doreisa/head_node.py:102-118) as a
  filesystem contract. Producers are plain processes (MPI ranks, sim
  nodes) needing only numpy + a shared filesystem / object store.

- **consumer side**: ``read_staged_timestep`` is a pure-JVM plan —
  ``spark.read.format("binaryFile")`` scans the chunk files and Catalyst
  expressions (regexp over the path) rebuild the CHUNK_SCHEMA columns.
  No Python worker touches the bytes until the consumer's own compute
  kernels do; throughput is file-system + JVM-scan bound
  (tools/stream_stress_staged.py measures the gain vs the DataSource).

- **driver loop**: ``staged_timesteps`` polls for markers and yields one
  (timestep, DataFrame) per sealed step in order — the reference's
  per-iteration callback loop, with ``cleanup=True`` reclaiming each
  step's staging files after the callback returns (bounded disk, the
  analog of the eager chunk release in streaming/simulation.py).

- ``stream_staged`` exposes the same directory as a Structured Streaming
  source (binaryFile supports readStream): an unbarriered firehose for
  consumers that window/watermark instead of stepping — maxFilesPerTrigger
  is the backpressure knob. Timestep-barriered consumers should use
  ``staged_timesteps``; a file-source micro-batch may straddle timesteps.

Scale shape (100 TB): one file per chunk means the scan parallelizes at
chunk granularity with locality (executors read their local/shard files);
the only driver work is directory listing. ``binaryFile`` caps a single
file at ``spark.sql.sources.binaryFile.maxLength`` (int32 bytes ~2 GiB) —
same per-cell bound the Arrow path already imposes on chunks.

File name contract (all metadata rides the name, so the scan projects
without opening anything): ``{name}__t{ts:08d}__p{pos}-{...}__s{shape}-
{...}.chunk`` — empty ``p``/``s`` segments encode the 0-d array.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.plans.chunked import GridMeta

_MARKER = "_COMPLETE"


def _ts_dir(stage_dir: str, timestep: int) -> str:
    return os.path.join(stage_dir, f"t{timestep:08d}")


def chunk_filename(name: str, timestep: int, pos: tuple[int, ...],
                   shape: tuple[int, ...]) -> str:
    import re

    # the name is parsed back out of the filename by a non-greedy match up
    # to the FIRST __t<digits>__ token — a name embedding that token (or a
    # path separator) would silently mis-parse every downstream column
    if "/" in name or re.search(r"__t\d+__", name):
        raise ValueError(
            f"array name {name!r} may not contain '/' or a '__t<digits>__' "
            "token (reserved by the staged-file name contract)"
        )
    p = "-".join(str(int(x)) for x in pos)
    s = "-".join(str(int(x)) for x in shape)
    return f"{name}__t{timestep:08d}__p{p}__s{s}.chunk"


def write_chunk(stage_dir: str, name: str, timestep: int,
                pos: tuple[int, ...], arr: np.ndarray) -> str:
    """Producer API: land one chunk as raw C-order bytes, atomically.

    The tmp+``os.replace`` dance guarantees a reader listing the directory
    never opens a half-written file; the final name alone carries all the
    metadata the scan needs. ``asarray`` (not ``ascontiguousarray``, which
    promotes 0-d to 1-d) — ``tobytes()`` emits C-order for any layout."""
    arr = np.asarray(arr)
    d = _ts_dir(stage_dir, timestep)
    os.makedirs(d, exist_ok=True)
    fname = chunk_filename(name, timestep, tuple(pos), arr.shape)
    tmp = os.path.join(d, f".{fname}.tmp{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(arr.tobytes())
    final = os.path.join(d, fname)
    os.replace(tmp, final)
    return final


def seal_timestep(stage_dir: str, timestep: int, *, n_chunks: int | None = None) -> None:
    """Producer API: declare timestep complete — every chunk file is in
    place. The marker carries the expected chunk count so the consumer can
    assert the barrier actually closed (a crashed producer that sealed
    early fails loudly, not with a silently-partial array)."""
    d = _ts_dir(stage_dir, timestep)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{_MARKER}.tmp{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump({"timestep": timestep, "n_chunks": n_chunks}, f)
    os.replace(tmp, os.path.join(d, _MARKER))


def write_timestep(stage_dir: str, name: str, timestep: int,
                   chunks: dict[tuple[int, ...], np.ndarray]) -> None:
    """Convenience producer: land a whole timestep's grid and seal it."""
    for pos, arr in chunks.items():
        write_chunk(stage_dir, name, timestep, pos, arr)
    seal_timestep(stage_dir, timestep, n_chunks=len(chunks))


def _parse_chunk_path(df: DataFrame) -> DataFrame:
    """CHUNK_SCHEMA columns from a binaryFile scan — Catalyst expressions
    only (regexp over ``path``), zero Python in the plan.

    Every extraction is anchored to the single trailing
    ``__t<ts>__p<pos>__s<shape>`` token run (``$``-anchored), so an array
    name that itself contains a ``__p2__``-style token can never donate a
    stray first match — only ``__t<digits>__`` is reserved (rejected at
    write time by ``chunk_filename``); ``__p``/``__s`` inside names are
    harmless because the parse never looks at them."""
    base = F.regexp_extract("path", r"([^/]+)\.chunk$", 1)
    tail = r"__t(\d+)__p([0-9\-]*)__s([0-9\-]*)$"
    to_ints = lambda seg: F.when(  # noqa: E731 — local expr builder
        seg == "", F.array().cast("array<int>")
    ).otherwise(F.transform(F.split(seg, "-"), lambda x: x.cast("int")))
    return df.select(
        F.regexp_extract(base, r"^(.+?)__t\d+__p[0-9\-]*__s[0-9\-]*$", 1).alias("name"),
        F.regexp_extract(base, tail, 1).cast("bigint").alias("timestep"),
        to_ints(F.regexp_extract(base, tail, 2)).alias("pos"),
        to_ints(F.regexp_extract(base, tail, 3)).alias("chunk_shape"),
        F.col("content").alias("data"),
    )


def read_staged_timestep(
    spark: SparkSession, stage_dir: str, timestep: int, *, assert_sealed: bool = True
) -> DataFrame:
    """One sealed timestep's chunk grid as a CHUNK_SCHEMA DataFrame —
    wrap with ``ChunkedArray(df, meta)`` for the dask-style ops."""
    d = _ts_dir(stage_dir, timestep)
    if assert_sealed and not os.path.exists(os.path.join(d, _MARKER)):
        raise FileNotFoundError(
            f"timestep {timestep} not sealed: no {_MARKER} in {d} "
            "(producer must seal_timestep after the last write_chunk)"
        )
    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.chunk").load(d)
    return _parse_chunk_path(raw)


def expected_chunks(stage_dir: str, timestep: int) -> int | None:
    """The sealed chunk count, if the producer recorded one."""
    try:
        with open(os.path.join(_ts_dir(stage_dir, timestep), _MARKER)) as f:
            return json.load(f).get("n_chunks")
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def staged_timesteps(
    spark: SparkSession,
    stage_dir: str,
    *,
    start: int = 0,
    max_timesteps: int | None = None,
    poll_s: float = 0.05,
    timeout_s: float = 600.0,
    cleanup: bool = False,
) -> Iterator[tuple[int, DataFrame]]:
    """Driver consumption loop: yield (timestep, chunk DataFrame) for each
    sealed timestep, IN ORDER, blocking until the producer seals the next
    one — the reference's per-iteration callback loop over the staged data
    plane. ``cleanup=True`` removes the step's staging directory after the
    consumer's iteration returns (bounded disk; only safe once the
    callback has materialized everything it needs from the step).

    Poll cost: each ``poll_s`` tick is ONE ``stat()`` on the next step's
    marker path (``os.path.exists``), never a directory listing — at the
    default 50 ms that is 20 syscalls/s of driver load regardless of step
    rate or chunk count; directory contents are only read once per SEALED
    step by the binaryFile scan itself."""
    import shutil

    ts = start
    deadline = time.monotonic() + timeout_s
    while max_timesteps is None or ts < start + max_timesteps:
        marker = os.path.join(_ts_dir(stage_dir, ts), _MARKER)
        if not os.path.exists(marker):
            if time.monotonic() > deadline:
                raise TimeoutError(f"timestep {ts} never sealed within {timeout_s}s")
            time.sleep(poll_s)
            continue
        deadline = time.monotonic() + timeout_s
        yield ts, read_staged_timestep(spark, stage_dir, ts, assert_sealed=False)
        if cleanup:
            shutil.rmtree(_ts_dir(stage_dir, ts), ignore_errors=True)
        ts += 1


def staged_sliding_windows(
    spark: SparkSession,
    stage_dir: str,
    meta,
    window_size: int,
    *,
    start: int = 0,
    max_timesteps: int | None = None,
    poll_s: float = 0.05,
    timeout_s: float = 600.0,
    cleanup: bool = False,
) -> "Iterator[tuple[int, list]]":
    """The reference's sliding-window callback contract
    (doreisa/window_api.py:88-97: last W arrays, fewer at stream start)
    over the binary-staged plane: yields ``(timestep, [ChunkedArray,...])``
    with the newest array LAST, window length growing to ``window_size``.

    ``cleanup=True`` reclaims a timestep's staging files only when it
    LEAVES the window (the eviction point of window_api.py:105-114) —
    staged arrays are re-scanned per use, not persisted, so deleting at
    consumption (staged_timesteps' behavior) would tear the older window
    members out from under the next iteration."""
    import shutil

    from doreisa_spark.plans.chunked import ChunkedArray

    if window_size < 1:
        raise ValueError("window_size must be >= 1")
    window: list = []
    for ts, df in staged_timesteps(
        spark,
        stage_dir,
        start=start,
        max_timesteps=max_timesteps,
        poll_s=poll_s,
        timeout_s=timeout_s,
        cleanup=False,
    ):
        window.append((ts, ChunkedArray(df, meta, ts)))
        if len(window) > window_size:
            old_ts, _old = window.pop(0)
            if cleanup:
                shutil.rmtree(_ts_dir(stage_dir, old_ts), ignore_errors=True)
        yield ts, [a for _, a in window]
    if cleanup:
        for old_ts, _old in window:
            shutil.rmtree(_ts_dir(stage_dir, old_ts), ignore_errors=True)


def stream_staged(
    spark: SparkSession, stage_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The staging directory as a Structured Streaming source (unbarriered
    firehose): new chunk files become CHUNK_SCHEMA rows as they land.
    Micro-batches follow file-arrival order, NOT timestep barriers — use
    ``staged_timesteps`` when an iteration must see its complete grid."""
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ])
    reader = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", "*.chunk")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # recursive: chunk files live under per-timestep subdirectories
    raw = reader.option("recursiveFileLookup", "true").load(stage_dir)
    return _parse_chunk_path(raw)


def grid_meta_for(name: str, grid: tuple[int, ...], chunk: tuple,
                  dtype: str = "float64") -> GridMeta:
    """Convenience mirror of the DataSource options for staged consumers."""
    return GridMeta(name, tuple(grid), chunk, dtype)

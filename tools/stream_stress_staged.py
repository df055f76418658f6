"""Throughput stress for the BINARY-STAGED ingest plane (round-6 verdict
ask #1): same BENCH grid as tools/stream_stress.py — 16x16 tiling of
512x512 float64 chunks, 512 MiB per timestep — but the data plane is
producer-written chunk files + a pure-JVM binaryFile scan
(sources/staged.py) instead of the Python DataSource.

Producers are separate PROCESSES (multiprocessing, one per simulated rank,
positions partitioned round-robin) — the realistic shape (simulation ranks
are processes, reference: doreisa/simulation_node.py), and it keeps the
driver's py4j loop off the producers' GIL: measured 8 in-process writer
THREADS throttled the whole pipeline ~4x by starving the driver thread.
Each rank drops a ``.rankN.done`` marker per timestep; a sealer thread in
the driver seals the step when every rank reported — the multi-producer
completion barrier (reference: head_node.py:102-118, chunk counting).

Producers are BACKPRESSURED to MAX_PENDING timesteps ahead of consumption
(a rank blocks before starting step t while step t-MAX_PENDING's staging
dir still exists — the consumer's cleanup is the progress signal). This
is the reference's own contract (``max_pending_arrays``, blocking
``add_chunk``, doreisa/simulation_node.py + window_api) and is also what
makes the measurement honest: unthrottled ranks burst the whole stream
into staging at memcpy speed, monopolizing the box while the first
consumer steps run (measured: first step 81 s vs a 1.1 s steady state),
then leave — neither memory-flat nor representative of a live feed.

Contract mirrors stream_stress.py so the two numbers are comparable:

- correctness: every timestep's fused global sum equals (t+1) x the
  closed-form ramp total;
- memory: no cached RDD may survive any step (executor storage flat);
- disk: each consumed step's staging files are reclaimed
  (staged_timesteps cleanup=True) — occupancy O(pipeline depth).

Staging defaults to /dev/shm when present (override with
SPARK_GRAFT_STAGE_DIR): the reference's producers hand chunks to the Ray
PLASMA store — also shared memory — so tmpfs staging is the faithful
single-node analog; a cluster deployment points this at the node-local
NVMe / burst buffer / object store the producers share with Spark.

    python tools/stream_stress_staged.py [timesteps] [producer_procs]

Prints one JSON line; BASELINE.md's streaming section records the result
next to the DataSource path's.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import threading
import time
from itertools import product

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doreisa_spark.plans.chunked import (  # noqa: E402
    ChunkedArray,
    GridMeta,
    expected_sum_arithmetic,
    ramp_chunk,
)
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.sources import staged  # noqa: E402

GRID = (16, 16)
CHUNK = (512, 512)
MAX_PENDING = 4  # reference: max_pending_arrays — ranks block this far ahead


def producer_rank(rank: int, n_ranks: int, n_steps: int, stage_dir: str) -> None:
    """One simulated simulation rank: writes its share of every timestep's
    grid, then drops its per-step done marker (atomic rename). Blocks
    before step t until step t-MAX_PENDING's staging dir is reclaimed by
    the consumer (the reference's blocking add_chunk backpressure)."""
    positions = [
        p
        for i, p in enumerate(product(*(range(g) for g in GRID)))
        if i % n_ranks == rank
    ]
    base = {pos: ramp_chunk(pos, CHUNK) for pos in positions}
    for ts in range(n_steps):
        if ts >= MAX_PENDING:
            gate = os.path.join(stage_dir, f"t{ts - MAX_PENDING:08d}")
            while os.path.isdir(gate):
                time.sleep(0.01)
        for pos in positions:
            staged.write_chunk(stage_dir, "grid", ts, pos, (ts + 1.0) * base[pos])
        d = os.path.join(stage_dir, f"t{ts:08d}")
        tmp = os.path.join(d, f".rank{rank}.tmp")
        with open(tmp, "w") as f:
            f.write(str(len(positions)))
        os.replace(tmp, os.path.join(d, f".rank{rank}.done"))


def main() -> None:
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_ranks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    default_stage = "/dev/shm" if os.path.isdir("/dev/shm") else None
    stage_dir = tempfile.mkdtemp(
        prefix="staged_stress_",
        dir=os.environ.get("SPARK_GRAFT_STAGE_DIR", default_stage),
    )
    spark = get_spark("stream-stress-staged")
    meta = GridMeta("grid", GRID, CHUNK)
    n_chunks = len(list(product(*(range(g) for g in GRID))))

    def sealer() -> None:
        """Seal each timestep once every rank's done marker landed."""
        for ts in range(n_steps):
            d = os.path.join(stage_dir, f"t{ts:08d}")
            while True:
                try:
                    done = [f for f in os.listdir(d) if f.endswith(".done")]
                except FileNotFoundError:
                    done = []
                if len(done) == n_ranks:
                    break
                time.sleep(0.02)
            staged.seal_timestep(stage_dir, ts, n_chunks=n_chunks)

    def cached_ids() -> set:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    baseline_cached = cached_ids()
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=producer_rank, args=(r, n_ranks, n_steps, stage_dir))
        for r in range(n_ranks)
    ]
    seal_thread = threading.Thread(target=sealer, daemon=True)

    sums: list[tuple[int, float]] = []
    extra_cached: list[int] = []
    step_done: list[float] = []
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    seal_thread.start()
    try:
        for ts, df in staged.staged_timesteps(
            spark, stage_dir, max_timesteps=n_steps, timeout_s=540, cleanup=True
        ):
            arr = ChunkedArray(df, meta)
            sums.append((ts, arr.sum().first()["total"]))
            extra_cached.append(len(cached_ids() - baseline_cached))
            step_done.append(time.perf_counter() - t0)
    finally:
        for p in procs:
            p.join(timeout=120)
        seal_thread.join(timeout=10)
    wall = time.perf_counter() - t0

    expected = expected_sum_arithmetic(meta)
    correct = sorted(sums) == [(t, (t + 1) * expected) for t in range(n_steps)]
    leftovers = [d for d in os.listdir(stage_dir) if d.startswith("t")]
    step_mib = n_chunks * CHUNK[0] * CHUNK[1] * 8 / 2**20
    gib = len(sums) * step_mib / 1024
    # steady state: marginal rate past the one-time warmup (JVM codegen +
    # 32-worker Python pool spin-up + producer spawn imports, all of which
    # a long-lived in-situ service pays once) — the scale-relevant number
    warm = min(5, max(0, len(step_done) - 2))
    steady = (
        (len(step_done) - warm) * step_mib / (step_done[-1] - step_done[warm - 1])
        if len(step_done) > warm >= 1
        else None
    )
    out = {
        "ok": bool(
            correct and extra_cached and max(extra_cached) == 0 and not leftovers
        ),
        "batches": len(sums),
        "sums_correct": correct,
        "max_extra_cached": max(extra_cached) if extra_cached else -1,
        "staging_leftover_dirs": len(leftovers),
        "producer_procs": n_ranks,
        "max_pending": MAX_PENDING,
        "gib_streamed": round(gib, 1),
        "wall_s": round(wall, 1),
        "mib_per_s": round(gib * 1024 / wall, 1),
        "steady_mib_per_s": round(steady, 1) if steady else None,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Bench-scale streaming-tensor stress run (round-5 verdict ask #8).

Streams the BENCH grid (16x16 tiling of 512x512 float64 chunks — 512 MiB
per timestep, the exact meta bench.py times) through N timesteps of the
custom DataSource stream reader, one micro-batch per timestep, with the
bounded-memory assertion of tests/test_simulation.py's
test_memory_release_bounded ported to the DataSource/foreachBatch path:

- correctness: every batch's fused global sum equals (t+1) x the
  closed-form ramp total (reference per-iteration barrier + callback,
  doreisa/window_api.py:66-119);
- memory: the sink is stateless, so no cached RDD created during the run
  may survive any batch — ~25 GiB flows through the pipe and executor
  storage stays flat.

Runs in its own SparkSession at SPARK_GRAFT_CPUS parallelism (the pytest
suite's shared fixture is deliberately 4-cpu; this is a throughput-scale
run). Prints one JSON line; tests/test_chunk_source.py asserts on it.

    python tools/stream_stress.py [timesteps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doreisa_spark.plans.chunked import (  # noqa: E402
    ChunkedArray,
    GridMeta,
    expected_sum_arithmetic,
)
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.sources import chunk_source  # noqa: E402


def main() -> None:
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("stream-stress")
    chunk_source.register(spark)
    meta = GridMeta("grid", (16, 16), (512, 512))

    def cached_ids() -> set:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    baseline = cached_ids()
    sums: list[tuple[int, float]] = []
    extra_cached: list[int] = []
    t0 = time.perf_counter()

    def sink(df, epoch):
        # ONE pass per batch: a second scan (e.g. selecting `timestep`)
        # would regenerate the full 512 MiB through the Python source.
        # Batch->timestep identity doesn't need it: per_trigger=1 pins
        # batch n = timestep n (offset contract, separately asserted by
        # test_stream_reader_one_batch_per_timestep), and the ramp_t sum
        # below proves the CONTENT is timestep n's — any other timestep's
        # data yields a different total.
        arr = ChunkedArray(df, meta)
        sums.append((epoch, arr.sum().first()["total"]))
        extra_cached.append(len(cached_ids() - baseline))

    stream = (
        spark.readStream.format("doreisa_chunks")
        .option("grid", "16,16").option("chunk", "512,512")
        .option("max_timesteps", str(n_steps))
        .option("timesteps_per_trigger", "1")
        .load()
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(processingTime="0 seconds")
            .option("checkpointLocation", ckpt)
            .start()
        )
        deadline = time.time() + 540
        while len(sums) < n_steps and time.time() < deadline:
            time.sleep(0.5)
        q.stop()

    base = expected_sum_arithmetic(meta)
    correct = sorted(sums) == [(t, (t + 1) * base) for t in range(n_steps)]
    out = {
        "ok": bool(correct and extra_cached and max(extra_cached) == 0),
        "batches": len(sums),
        "sums_correct": correct,
        "max_extra_cached": max(extra_cached) if extra_cached else -1,
        "final_extra_cached": len(cached_ids() - baseline),
        "gib_streamed": round(len(sums) * 16 * 16 * 512 * 512 * 8 / 2**30, 1),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

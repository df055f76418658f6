"""run_simulation analog tests — mirror the reference's e2e scenarios:
core loop (tests/test_doreisa.py:30-53), sliding window
(tests/test_sliding_window.py:17-35), several arrays
(tests/test_several_arrays.py:17-40), preprocess callback
(tests/test_preprocessing_callback.py:17-26), plan-ahead
(tests/test_prepare_iteration.py:17-35). Oracles are closed-form sums of
known chunk grids, exactly as the reference asserts inside callbacks."""

from __future__ import annotations

import numpy as np

from doreisa_spark.streaming import ArrayDefinition, run_simulation
from doreisa_spark.streaming.simulation import PreparedIteration

GRID = (2, 2)
CHUNK = (4, 4)
CHUNK_SUM = CHUNK[0] * CHUNK[1]  # sum of a chunk of ones


def _produce(ingest, *, name="temps", steps=5, factor=1):
    """4 ranks each push (rank+1)·t·ones chunks per timestep
    (reference: tests/utils.py:26-47)."""
    for t in range(steps):
        for rank, pos in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            chunk = float(factor * (rank + 1) * t) * np.ones(CHUNK)
            ingest.add_chunk(name, pos, GRID, t, chunk)


def expected_total(t: int, factor: int = 1) -> float:
    # sum over ranks of (rank+1)·t·CHUNK_SUM = 10·t·CHUNK_SUM·factor
    return float(10 * t * CHUNK_SUM * factor)


def test_core_loop(spark):
    seen = []

    def callback(temps, timestep):
        seen.append((timestep, temps.sum().collect()[0]["total"]))

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=5,
        producers=lambda ing: _produce(ing, steps=5),
    )
    assert seen == [(t, expected_total(t)) for t in range(5)]


def test_sliding_window(spark):
    lengths, diffs = [], []

    def callback(temps, timestep):
        lengths.append(len(temps))
        if len(temps) == 2:
            diffs.append(temps[1].zip_with(temps[0], "-").sum().collect()[0]["total"])

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps", window_size=2)],
        max_iterations=4,
        producers=lambda ing: _produce(ing, steps=4),
    )
    # short window at stream start (window_api.py:91-97)
    assert lengths == [1, 2, 2, 2]
    # (a[t] - a[t-1]).sum() == 10·CHUNK_SUM  (test_sliding_window.py:27)
    assert diffs == [float(10 * CHUNK_SUM)] * 3


def test_several_arrays_and_preprocess(spark):
    got = []

    def callback(a, b, timestep):
        got.append(
            (
                timestep,
                a.sum().collect()[0]["total"],
                b[-1].sum().collect()[0]["total"],
            )
        )

    def producers(ing):
        _produce(ing, name="a", steps=3)
        _produce(ing, name="b", steps=3)

    run_simulation(
        spark,
        callback,
        [
            ArrayDefinition("a"),
            # preprocess 2x on one array (test_several_arrays.py:37)
            ArrayDefinition("b", window_size=2, preprocess=lambda x: 2 * x),
        ],
        max_iterations=3,
        producers=producers,
    )
    assert got == [(t, expected_total(t), 2 * expected_total(t)) for t in range(3)]


def test_out_of_order_timesteps(spark):
    """Chunks for t=1 arrive before t=0 — buffered, callback still in order
    (window_api.py:75-85)."""
    seen = []

    def producers(ing):
        for t in (1, 0, 2):
            for rank, pos in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
                ing.add_chunk("x", pos, GRID, t, float(t) * np.ones(CHUNK))

    def callback(x, timestep):
        seen.append((timestep, x.sum().collect()[0]["total"]))

    run_simulation(
        spark, callback, [ArrayDefinition("x")], max_iterations=3, producers=producers
    )
    assert [s[0] for s in seen] == [0, 1, 2]
    assert seen[2][1] == 2.0 * 4 * CHUNK_SUM


def test_prepare_iteration(spark):
    """Plan-ahead runs before data exists and its result reaches the
    callback (window_api.py:58-72, preparation_advance=2)."""
    prepared, received = [], []

    def prepare(desc: PreparedIteration):
        prepared.append(desc.timestep)
        return ("plan", desc.timestep)

    def callback(temps, timestep, preparation_result):
        received.append(preparation_result)

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=3,
        producers=lambda ing: _produce(ing, steps=3),
        prepare_iteration=prepare,
        preparation_advance=2,
    )
    assert received == [("plan", 0), ("plan", 1), ("plan", 2)]
    assert set(prepared) >= {0, 1, 2}


def test_prepare_iteration_zero_advance(spark):
    """advance=0: iteration i's preparation is launched at the top of the
    loop, BEFORE i is consumed (window_api.py:66-72 ordering), so every
    result reaches the callback — no unconsumed futures accumulate."""
    received = []

    def prepare(desc: PreparedIteration):
        return ("plan", desc.timestep)

    def callback(temps, timestep, preparation_result):
        received.append(preparation_result)

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=3,
        producers=lambda ing: _produce(ing, steps=3),
        prepare_iteration=prepare,
        preparation_advance=0,
    )
    assert received == [("plan", 0), ("plan", 1), ("plan", 2)]


def test_grid_change_rejected(spark):
    import pytest

    def producers(ing):
        ing.add_chunk("y", (0,), (2,), 0, np.ones(4))
        ing.add_chunk("y", (1,), (2,), 0, np.ones(4))
        with pytest.raises(ValueError, match="grid changed"):
            ing.add_chunk("y", (0,), (3,), 1, np.ones(4))
        # recover: push the real t=1 grid so the driver loop finishes
        ing.add_chunk("y", (0,), (2,), 1, np.ones(4))
        ing.add_chunk("y", (1,), (2,), 1, np.ones(4))

    run_simulation(
        spark,
        lambda y, timestep: None,
        [ArrayDefinition("y")],
        max_iterations=2,
        producers=producers,
    )


def test_memory_release_bounded(spark):
    """Reference parity: tests/test_memory_release.py asserts ZERO spill
    over 100 iterations in a 100 MiB object store — the window eviction
    must actually release chunk memory. The Spark analog: the number of
    cached RDDs observed by the storage layer stays bounded by the window
    across many iterations, and everything is released when the run ends
    (window_api.py:105-119 eviction -> unpersist)."""

    def cached_rdds() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    baseline = cached_rdds()  # other tests in the shared session may cache
    high_water = []

    def callback(temps, timestep):
        temps[-1].sum().collect()
        high_water.append(cached_rdds())

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps", window_size=2)],
        max_iterations=30,
        producers=lambda ing: _produce(ing, steps=30),
    )
    # in-flight bound: current window (2) + pending ingest (max 2 per
    # definition) + the one being built; anything growing with iteration
    # count is an eviction leak
    assert max(high_water) <= baseline + 6, high_water
    # end-of-run: only the final window's retained array may remain
    # (unpersist is async — allow it a moment to settle)
    import time

    for _ in range(20):
        if cached_rdds() <= baseline + 1:
            break
        time.sleep(0.25)
    assert cached_rdds() <= baseline + 1


def test_staged_timestep_reader(spark, tmp_path):
    """Scale-path ingest: producers drop one parquet of chunk rows per
    timestep under ts=<N>/; the reader yields complete timesteps in order
    and stops after the last one."""
    from doreisa_spark.plans.chunked import ChunkedArray, GridMeta
    from doreisa_spark.streaming.simulation import staged_timestep_reader

    staging = str(tmp_path / "staging")
    meta = GridMeta("temps", GRID, CHUNK)
    for t in range(3):
        chunks = {
            pos: float((rank + 1) * t) * np.ones(CHUNK)
            for rank, pos in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)])
        }
        arr = ChunkedArray.from_numpy_chunks(spark, "temps", chunks, timestep=t)
        arr.df.write.mode("overwrite").parquet(f"{staging}/ts={t}")

    seen = []
    for ts, arr in staged_timestep_reader(spark, staging, meta):
        seen.append((ts, arr.sum().first()["total"]))
    assert seen == [(t, expected_total(t)) for t in range(3)]


def test_hashable_timestep_keys(spark):
    """Timesteps are opaque Hashable keys (reference doreisa/__init__.py:
    Timestep = Hashable): a simulation keying steps by (run_id, t) tuples
    runs through run_simulation; callbacks receive the original key and
    iterations fire in first-arrival order."""
    steps = [("runA", 0), ("runA", 1), ("runB", 0)]
    seen = []

    def produce(ingest):
        for t, key in enumerate(steps):
            for rank, pos in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
                chunk = float((rank + 1) * t) * np.ones(CHUNK)
                ingest.add_chunk("temps", pos, GRID, key, chunk)

    def callback(temps, timestep):
        seen.append((timestep, temps.sum().collect()[0]["total"]))

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=3,
        producers=produce,
    )
    assert seen == [(key, expected_total(t)) for t, key in enumerate(steps)]


def test_callback_composes_structural_ops(spark):
    """The callback gets a first-class ChunkedArray: stencil, scan, and
    argmax compose per timestep exactly like dask ops inside a reference
    callback (docs/analytics.md:12-30 pattern)."""
    seen = []

    def callback(temps, timestep):
        # per-rank constant chunks: diff along axis 0 is 0 inside chunks
        # and (rank-delta) across the chunk boundary
        d = temps.axis_diff(axis=0).sum().collect()[0]["total"]
        cs = temps.axis_cumsum(axis=1).sum().collect()[0]["total"]
        top = temps.argmax().collect()[0]
        seen.append((timestep, d, cs, tuple(top["coords"])))

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=3,
        producers=lambda ing: _produce(ing, steps=3),
    )
    for t, d, cs, top in seen:
        # dense oracle: assemble the same grid in numpy
        dense = np.block(
            [
                [1.0 * t * np.ones(CHUNK), 2.0 * t * np.ones(CHUNK)],
                [3.0 * t * np.ones(CHUNK), 4.0 * t * np.ones(CHUNK)],
            ]
        )
        assert d == np.diff(dense, axis=0).sum()
        assert cs == dense.cumsum(axis=1).sum()
        assert top == np.unravel_index(dense.argmax(), dense.shape)


def test_callback_composes_indexing_and_reshape(spark):
    """Round-5 surface inside the consumption loop: reshape, boolean
    masking, take, and topk all compose on the per-timestep array, so a
    reference callback using any dask indexing idiom ports directly."""
    seen = []

    def callback(temps, timestep):
        flat_sum = temps.reshape((CHUNK[0] * GRID[0] * CHUNK[1] * GRID[1],)).sum()
        mask = temps.map_numpy(lambda a: (a > 2.0 * timestep).astype(np.float64))
        masked = temps.boolean_select(mask).sum()
        rows = temps.take([0, 7, 7], axis=0).sum()
        top = temps.topk(2).collect()
        seen.append(
            (
                timestep,
                flat_sum.collect()[0]["total"],
                masked.collect()[0]["total"],
                rows.collect()[0]["total"],
                [r["value"] for r in top],
            )
        )

    run_simulation(
        spark,
        callback,
        [ArrayDefinition("temps")],
        max_iterations=3,
        producers=lambda ing: _produce(ing, steps=3),
    )
    for t, flat_sum, masked, rows, top in seen:
        dense = np.block(
            [
                [1.0 * t * np.ones(CHUNK), 2.0 * t * np.ones(CHUNK)],
                [3.0 * t * np.ones(CHUNK), 4.0 * t * np.ones(CHUNK)],
            ]
        )
        assert flat_sum == dense.sum()
        assert masked == dense[dense > 2.0 * t].sum()
        assert rows == dense[[0, 7, 7]].sum()
        assert top == sorted(dense.ravel(), reverse=True)[:2]

"""Binary-staged chunk ingest (sources/staged.py): the zero-Python data
plane must be bit-equivalent to the DataSource/driver-Ingest paths.

Covers: filename round-trip (incl. ragged + 0-d edge shapes), pure-JVM
path parsing, the sealed-barrier contract, the ordered driver loop with
producer overlap + cleanup, and the Structured Streaming firehose."""

from __future__ import annotations

import os
import threading

import numpy as np
import pytest

from doreisa_spark.plans.chunked import ChunkedArray, GridMeta, ramp_chunk
from doreisa_spark.sources import staged


def _ramp_chunks(meta: GridMeta, scale: float = 1.0):
    from itertools import product

    out = {}
    for pos in product(*(range(n) for n in meta.nb_chunks_per_dim)):
        out[pos] = scale * ramp_chunk(pos, meta.shape_of(pos))
    return out


def test_filename_roundtrip_parses_jvm_side(spark, tmp_path):
    meta = GridMeta("grid", (2, 3), (4, 5))
    chunks = _ramp_chunks(meta)
    staged.write_timestep(str(tmp_path), "grid", 7, chunks)
    df = staged.read_staged_timestep(spark, str(tmp_path), 7)
    assert df.columns == ["name", "timestep", "pos", "chunk_shape", "data"]
    rows = df.collect()
    assert len(rows) == 6
    for r in rows:
        assert r["name"] == "grid" and r["timestep"] == 7
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(r["chunk_shape"])
        assert np.array_equal(arr, chunks[tuple(r["pos"])])


def test_staged_equals_datasource_content(spark, tmp_path):
    """The staged plane and the from_function plane produce the same
    dense array — exact global sum and exact per-element equality."""
    meta = GridMeta("grid", (3, 2), (8, 8))
    staged.write_timestep(str(tmp_path), "grid", 0, _ramp_chunks(meta))
    a = ChunkedArray(staged.read_staged_timestep(spark, str(tmp_path), 0), meta)
    b = ChunkedArray.from_function(spark, meta, ramp_chunk)
    assert np.array_equal(a.to_numpy(), b.to_numpy())
    assert a.sum().first()["total"] == b.sum().first()["total"]


def test_ragged_and_0d_filenames(spark, tmp_path):
    # ragged tiling: per-dim size tuples
    meta = GridMeta("rag", (2,), ((3, 2),))
    chunks = {(0,): np.array([10.0, 11.0, 12.0]), (1,): np.array([20.0, 21.0])}
    staged.write_timestep(str(tmp_path), "rag", 0, chunks)
    arr = ChunkedArray(staged.read_staged_timestep(spark, str(tmp_path), 0), meta)
    assert np.array_equal(arr.to_numpy(), np.array([10.0, 11.0, 12.0, 20.0, 21.0]))
    # 0-d: empty pos and shape segments
    zdir = str(tmp_path / "zero")
    staged.write_chunk(zdir, "z", 0, (), np.array(42.0))
    staged.seal_timestep(zdir, 0, n_chunks=1)
    r = staged.read_staged_timestep(spark, zdir, 0).collect()[0]
    assert list(r["pos"]) == [] and list(r["chunk_shape"]) == []
    assert np.frombuffer(r["data"], dtype=np.float64)[0] == 42.0


def test_reserved_name_tokens_rejected(spark, tmp_path):
    """Names embedding the filename contract's reserved token (or a path
    separator) must be rejected at write time, not mis-parsed at read."""
    with pytest.raises(ValueError, match="reserved"):
        staged.write_chunk(str(tmp_path), "x__t5__y", 0, (0,), np.zeros(2))
    with pytest.raises(ValueError, match="reserved"):
        staged.write_chunk(str(tmp_path), "a/b", 0, (0,), np.zeros(2))
    # plain double underscores NOT followed by the t-token parse correctly
    staged.write_chunk(str(tmp_path), "a__b", 0, (0,), np.arange(2.0))
    staged.seal_timestep(str(tmp_path), 0, n_chunks=1)
    r = staged.read_staged_timestep(spark, str(tmp_path), 0).collect()[0]
    assert r["name"] == "a__b" and r["timestep"] == 0


def test_name_with_p_s_tokens_parses_correctly(spark, tmp_path):
    """ADVICE r7: an array name containing a '__p<digits>__' (or
    '__s<digits>') token is LEGAL and must parse to its own grid
    position — the pos/shape extraction anchors to the unique trailing
    __t__p__s run, never to a first-match inside the name."""
    chunks = {(0, 1): np.arange(6.0).reshape(2, 3)}
    staged.write_chunk(str(tmp_path), "sensor__p2__temp", 0, (0, 1), chunks[(0, 1)])
    staged.write_chunk(str(tmp_path), "gauge__s9", 0, (0, 1), chunks[(0, 1)])
    staged.seal_timestep(str(tmp_path), 0, n_chunks=2)
    rows = {r["name"]: r for r in
            staged.read_staged_timestep(spark, str(tmp_path), 0).collect()}
    assert set(rows) == {"sensor__p2__temp", "gauge__s9"}
    for r in rows.values():
        assert list(r["pos"]) == [0, 1], r
        assert list(r["chunk_shape"]) == [2, 3], r
        got = np.frombuffer(r["data"], dtype=np.float64).reshape(2, 3)
        assert np.array_equal(got, chunks[(0, 1)])


def test_staged_timesteps_chaos_producers(spark, tmp_path):
    """r7 verdict ask #8: slow/bursty producer PROCESSES (fork — the
    realistic simulation-rank shape, as in tools/stream_stress_staged)
    land chunks in shuffled per-producer order and steps get SEALED out
    of timestep order; the consumer loop must still yield strictly
    ordered, COMPLETE steps, and cleanup must bound staging occupancy to
    the unconsumed tail."""
    import multiprocessing as mp
    import random
    import time as _time

    meta = GridMeta("grid", (2, 2), (4, 4))
    n_steps = 6
    all_pos = [(i, j) for i in range(2) for j in range(2)]

    def produce(half: int, order: list[int], seed: int):
        rng = random.Random(seed)
        mine = all_pos[:2] if half == 0 else all_pos[2:]
        for ts in order:
            for pos in mine:
                _time.sleep(rng.uniform(0, 0.01))  # bursty jitter
                staged.write_chunk(
                    str(tmp_path), "grid", ts, pos,
                    ramp_chunk(pos, meta.shape_of(pos)) * float(ts + 1),
                )

    orders = [list(range(n_steps)), list(range(n_steps))]
    random.Random(1).shuffle(orders[0])  # producers disagree on step order,
    random.Random(2).shuffle(orders[1])  # so completion order is chaotic

    # barrier owner (the reference's head-node role): seals each step
    # exactly once the moment its 4 chunks have landed — seal order =
    # completion order, i.e. OUT of timestep order
    def sealer():
        sealed: set[int] = set()
        deadline = _time.monotonic() + 30
        while len(sealed) < n_steps and _time.monotonic() < deadline:
            for ts in range(n_steps):
                if ts in sealed:
                    continue
                d = os.path.join(str(tmp_path), f"t{ts:08d}")
                if os.path.isdir(d) and len(
                    [f for f in os.listdir(d) if f.endswith(".chunk")]
                ) == 4:
                    staged.seal_timestep(str(tmp_path), ts, n_chunks=4)
                    sealed.add(ts)
            _time.sleep(0.005)

    ctx = mp.get_context("fork")  # fork: closures need no pickling, and
    # the children never touch the parent's JVM/py4j state
    procs = [
        ctx.Process(target=produce, args=(h, orders[h], 10 + h))
        for h in range(2)
    ]
    threads = [threading.Thread(target=sealer)]
    for p in procs:
        p.start()
    for t in threads:
        t.start()
    seen = []
    for ts, df in staged.staged_timesteps(
        spark, str(tmp_path), max_timesteps=n_steps, timeout_s=60, cleanup=True
    ):
        rows = df.collect()
        # COMPLETE: all 4 chunks present with this step's scaled content
        assert len(rows) == 4, (ts, len(rows))
        for r in rows:
            got = np.frombuffer(r["data"], dtype=np.float64).reshape(r["chunk_shape"])
            expect = ramp_chunk(tuple(r["pos"]), meta.shape_of(tuple(r["pos"])))
            assert np.array_equal(got, expect * float(ts + 1))
        seen.append(ts)
        # bounded occupancy: every FULLY consumed step's staging dir is
        # gone (the generator reclaims step t when it advances past it,
        # so inside the body for ts only steps < ts are reclaimed yet)
        live = [d for d in os.listdir(tmp_path) if d.startswith("t")]
        assert not [d for d in live if int(d[1:]) < ts], (ts, live)
    for p in procs:
        p.join(timeout=30)
        assert p.exitcode == 0
    for t in threads:
        t.join()
    assert seen == list(range(n_steps))  # strictly ordered despite chaos
    assert [d for d in os.listdir(tmp_path) if d.startswith("t")] == []


def test_unsealed_timestep_raises(spark, tmp_path):
    staged.write_chunk(str(tmp_path), "g", 0, (0,), np.zeros(4))
    with pytest.raises(FileNotFoundError, match="not sealed"):
        staged.read_staged_timestep(spark, str(tmp_path), 0)
    staged.seal_timestep(str(tmp_path), 0, n_chunks=1)
    assert staged.expected_chunks(str(tmp_path), 0) == 1
    assert staged.read_staged_timestep(spark, str(tmp_path), 0).count() == 1


def test_staged_timesteps_overlapped_producer_cleanup(spark, tmp_path):
    """Producer thread seals timesteps while the consumer loop runs: every
    step arrives in order with (t+1)-scaled content; cleanup bounds disk."""
    meta = GridMeta("grid", (2, 2), (4, 4))
    n_steps = 4

    def produce():
        for ts in range(n_steps):
            staged.write_timestep(
                str(tmp_path), "grid", ts, _ramp_chunks(meta, scale=float(ts + 1))
            )

    t = threading.Thread(target=produce)
    t.start()
    expect_base = None
    seen = []
    for ts, df in staged.staged_timesteps(
        spark, str(tmp_path), max_timesteps=n_steps, timeout_s=60, cleanup=True
    ):
        total = ChunkedArray(df, meta).sum().first()["total"]
        if expect_base is None:
            dense = np.zeros((8, 8))
            for pos, c in _ramp_chunks(meta).items():
                dense[pos[0] * 4 : pos[0] * 4 + 4, pos[1] * 4 : pos[1] * 4 + 4] = c
            expect_base = dense.sum()
        assert total == (ts + 1) * expect_base
        seen.append(ts)
    t.join()
    assert seen == list(range(n_steps))
    # cleanup removed every consumed step's staging dir
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith("t")]
    assert leftovers == []


def test_staged_sliding_windows_short_at_start_and_eviction_cleanup(spark, tmp_path):
    """window_api.py:88-97 semantics on the staged plane: last W arrays,
    fewer at stream start; eviction-deferred cleanup reclaims a step's
    files only when it leaves the window (older members stay readable)."""
    meta = GridMeta("grid", (2, 2), (4, 4))
    n_steps, W = 4, 2
    for ts in range(n_steps):
        staged.write_timestep(str(tmp_path), "grid", ts, _ramp_chunks(meta, float(ts + 1)))
    base = None
    seen = []
    for ts, window in staged.staged_sliding_windows(
        spark, str(tmp_path), meta, W, max_timesteps=n_steps, timeout_s=60, cleanup=True
    ):
        assert len(window) == min(ts + 1, W)
        # EVERY window member still readable (its staging files live)
        totals = [a.sum().first()["total"] for a in window]
        if base is None:
            base = totals[0]
        assert totals == [(t + 1) * base for t in range(max(0, ts - W + 1), ts + 1)]
        seen.append(ts)
        live = sorted(os.listdir(tmp_path))
        assert f"t{max(0, ts - W + 1):08d}" in live  # window members live
        if ts >= W:
            assert f"t{ts - W:08d}" not in live  # evicted step reclaimed
    assert seen == list(range(n_steps))
    assert [d for d in os.listdir(tmp_path) if d.startswith("t")] == []


def test_staged_multi_array_and_complex_dtype(spark, tmp_path):
    """Several named arrays multiplex through one timestep dir (the
    reference's several-arrays sync); raw-byte payloads round-trip any
    dtype — complex128 checked end-to-end through a ChunkedArray sum."""
    rng = np.random.default_rng(31)
    a = {(0,): rng.normal(size=4), (1,): rng.normal(size=4)}
    b = {(0,): (rng.normal(size=3) + 1j * rng.normal(size=3)).astype(np.complex128),
         (1,): (rng.normal(size=3) + 1j * rng.normal(size=3)).astype(np.complex128)}
    for pos, arr in a.items():
        staged.write_chunk(str(tmp_path), "a", 0, pos, arr)
    for pos, arr in b.items():
        staged.write_chunk(str(tmp_path), "b", 0, pos, arr)
    staged.seal_timestep(str(tmp_path), 0, n_chunks=4)
    df = staged.read_staged_timestep(spark, str(tmp_path), 0)
    meta_a = GridMeta("a", (2,), (4,))
    meta_b = GridMeta("b", (2,), (3,), "complex128")
    arr_a = ChunkedArray(df.where(df["name"] == "a"), meta_a)
    arr_b = ChunkedArray(df.where(df["name"] == "b"), meta_b)
    import pytest as _pytest

    dense_a = np.concatenate([a[(0,)], a[(1,)]])
    assert arr_a.sum().first()["total"] == _pytest.approx(dense_a.sum(), rel=1e-12)
    dense_b = np.concatenate([b[(0,)], b[(1,)]])
    row = arr_b.sum().first()
    assert row["total_re"] == _pytest.approx(dense_b.sum().real, rel=1e-12)
    assert row["total_im"] == _pytest.approx(dense_b.sum().imag, rel=1e-12)


def test_staged_roundtrip_property(spark, tmp_path):
    """Property sweep: arbitrary dtype x shape x grid chunks round-trip
    bit-exactly through filename encoding + binaryFile + path parse."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    counter = [0]

    @settings(
        max_examples=8, deadline=None, derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        dtype=st.sampled_from(["uint8", "int16", "int64", "float32", "float64"]),
        rows=st.integers(1, 6),
        cols=st.integers(1, 6),
        gi=st.integers(1, 3),
        gj=st.integers(1, 2),
    )
    def check(dtype, rows, cols, gi, gj):
        counter[0] += 1
        d = str(tmp_path / f"p{counter[0]}")
        rng = np.random.default_rng(counter[0])
        chunks = {
            (i, j): rng.integers(0, 100, size=(rows, cols)).astype(dtype)
            for i in range(gi)
            for j in range(gj)
        }
        staged.write_timestep(d, "g", 3, chunks)
        rows_back = staged.read_staged_timestep(spark, d, 3).collect()
        assert len(rows_back) == gi * gj
        for r in rows_back:
            got = np.frombuffer(r["data"], dtype=dtype).reshape(r["chunk_shape"])
            assert r["timestep"] == 3
            assert np.array_equal(got, chunks[tuple(r["pos"])])

    check()


def test_staged_bench_scale_bounded(tmp_path):
    """Bench-scale staged pipeline (r6 verdict ask #1) in a SUBPROCESS
    with its own bench-parallelism session (same rationale as
    test_stream_bench_scale_bounded_memory): 20 timesteps of the
    16x16x512x512 grid — 10 GiB — through multi-process producers +
    the pure-JVM binaryFile consumer, asserting closed-form sums, zero
    cached-RDD growth, and fully-reclaimed staging."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "stream_stress_staged.py"), "20"],
        capture_output=True, text=True, timeout=900, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["batches"] == 20, report
    assert report["sums_correct"], report
    assert report["max_extra_cached"] == 0, report
    assert report["staging_leftover_dirs"] == 0, report


def test_stream_staged_firehose(spark, tmp_path):
    """The Structured Streaming source drains landed chunk files into
    CHUNK_SCHEMA rows (availableNow semantics via processAllAvailable)."""
    meta = GridMeta("grid", (2, 2), (4, 4))
    for ts in range(2):
        staged.write_timestep(str(tmp_path), "grid", ts, _ramp_chunks(meta, float(ts + 1)))
    got = []
    stream = staged.stream_staged(spark, str(tmp_path))
    assert stream.isStreaming

    def sink(df, epoch):
        got.extend(df.collect())

    ckpt = str(tmp_path / "_ckpt")
    q = stream.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(got) == 8  # 4 chunks x 2 timesteps
    by_ts = {}
    for r in got:
        a = np.frombuffer(r["data"], dtype=np.float64).reshape(r["chunk_shape"])
        by_ts.setdefault(r["timestep"], 0.0)
        by_ts[r["timestep"]] += float(a.sum())
    assert by_ts[1] == pytest.approx(2 * by_ts[0])

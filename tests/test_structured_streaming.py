"""Structured Streaming event-time layer: the streaming plans must produce
exactly what the equivalent batch aggregation produces once the finite
source is drained (availableNow trigger).

The source is staged as THREE time-ordered parquet files with strictly
increasing mtimes, so the file source consumes them oldest-first (one per
trigger) and the watermark advances monotonically — the arrival model of a
well-behaved producer. Append mode only emits a window once the watermark
passes its end, so the deterministic expectation is: everything emitted
matches batch exactly, and every batch window that ended at least
`watermark` before the second file's max event time (the watermark floor
going into the final trigger) must have been emitted.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.streaming import structured as S

from conftest import SF_SMALL

WATERMARK = "2 hours"
WATERMARK_SEC = 2 * 3600


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Stage sf0.001 events as 3 single-file parquets split by time range,
    with increasing mtimes — producers dropping one file per micro-batch,
    in event-time order."""
    src = tmp_path_factory.mktemp("events_stream")
    in_dir = src / "in"
    in_dir.mkdir()
    ev = table(spark, SF_SMALL, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds()
    bounds = [lo, *(lo + type(hi - lo)(seconds=span * f) for f in (1 / 3, 2 / 3)), hi]
    file2_max = None
    for i in range(3):
        part = ev.where(
            (F.col("ts") >= F.lit(bounds[i]))
            & (F.col("ts") <= F.lit(bounds[i + 1]) if i == 2 else F.col("ts") < F.lit(bounds[i + 1]))
        )
        if i == 1:
            file2_max = part.agg(F.max("ts")).first()[0]
        tmp = str(src / f"tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        data_file = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = str(in_dir / f"{i:05d}.parquet")
        os.rename(os.path.join(tmp, data_file), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return str(in_dir), file2_max


def test_tumbling_counts_match_batch(spark, event_source):
    source_dir, file2_max = event_source
    stream = S.tumbling_counts(
        S.read_event_stream(spark, source_dir), watermark=WATERMARK
    )
    name = S.run_to_memory(stream, "t_tumbling", output_mode="append")
    got = spark.table(name)

    batch = (
        spark.read.parquet(source_dir)
        .groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # exactness: every emitted window equals its batch counterpart
    assert g.items() <= b.items()
    # completeness up to the watermark floor of the final trigger
    import datetime as dt

    horizon = file2_max - dt.timedelta(seconds=WATERMARK_SEC)
    must_emit = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.where(F.col("window_end") <= F.lit(horizon)).collect()
    }
    assert must_emit.items() <= g.items()
    assert len(must_emit) > 0  # the bound is not vacuous on this data


def test_stateful_user_totals_match_batch(spark, event_source):
    """The custom applyInPandasWithState accumulator, drained over the
    finite source, must end at exactly the batch per-user totals (update
    mode re-emits per trigger; the LAST emission per user is the final
    state)."""
    source_dir, _ = event_source
    stream = S.stateful_user_totals(S.read_event_stream(spark, source_dir))
    name = S.run_to_memory(stream, "t_stateful", output_mode="update")
    got = spark.table(name)

    # last emission per user = row with the max n_events (monotone counter)
    final = {}
    for r in got.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in spark.read.parquet(source_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, s) in final.items():
        assert n == batch[uid][0]
        assert s == pytest.approx(batch[uid][1], rel=1e-9)


def test_stream_stream_join_matches_batch(spark, event_source):
    """The watermarked stream-stream purchase←clicks join, drained over the
    finite time-ordered source, must emit exactly the batch join's pairs:
    the 60-minute join horizon is far inside the 2-hour watermark, so no
    matching row is ever state-evicted before its partner arrives."""
    source_dir, _ = event_source
    stream = S.stream_stream_purchase_clicks(S.read_event_stream(spark, source_dir))
    name = S.run_to_memory(stream, "t_ssjoin", output_mode="append")
    got = {(r["purchase_id"], r["click_id"]) for r in spark.table(name).collect()}

    ev = spark.read.parquet(source_dir)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    batch = {
        (r["pid"], r["cid"])
        for r in p.join(
            c,
            (p["user_id"] == c["cu"])
            & (c["cts"] <= p["pts"])
            & (c["cts"] >= p["pts"] - F.expr("INTERVAL 60 MINUTES")),
        ).collect()
    }
    assert got == batch
    assert len(batch) > 0


def test_foreach_batch_sink(spark, event_source, tmp_path):
    """foreachBatch: every micro-batch lands in user code as a plain
    DataFrame; appending each to a parquet sink and draining the finite
    source must reproduce the full input exactly."""
    source_dir, _ = event_source
    out = str(tmp_path / "fb_out")
    seen_epochs = []

    def sink(df, epoch_id):
        seen_epochs.append(epoch_id)
        df.write.mode("append").parquet(out)

    S.run_foreach_batch(S.read_event_stream(spark, source_dir), sink)
    assert len(seen_epochs) >= 2  # one per staged file (3), at least two

    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    want = {r["event_id"] for r in spark.read.parquet(source_dir).collect()}
    assert got == want


def test_session_windows_match_batch(spark, event_source):
    source_dir, file2_max = event_source
    stream = S.session_windows(
        S.read_event_stream(spark, source_dir), gap="30 minutes", watermark=WATERMARK
    )
    name = S.run_to_memory(stream, "t_sessions", output_mode="append")
    got = spark.table(name)

    batch = (
        spark.read.parquet(source_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
    g = {(r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()}
    b = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()}
    assert g.items() <= b.items()
    import datetime as dt

    horizon = file2_max - dt.timedelta(seconds=WATERMARK_SEC)
    must_emit = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch.where(F.col("session_end") <= F.lit(horizon)).collect()
    }
    assert must_emit.items() <= g.items()
    assert len(must_emit) > 0


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a second file redelivering half of
    the first file's event_ids (an at-least-once producer retry) must
    add only the genuinely-new ids to the output."""
    import pandas as pd

    src = tmp_path / "dedup_in"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def rows(ids, minute0):
        return pd.DataFrame(
            {
                "event_id": pd.array(ids, dtype="int64"),
                "ts": [base + pd.Timedelta(minutes=minute0 + i) for i in range(len(ids))],
                "user_id": pd.array([i % 3 for i in ids], dtype="int64"),
                "event_type": ["click"] * len(ids),
                "value": [float(i) for i in ids],
                "props": ["{}"] * len(ids),
            }
        )

    # file 1: ids 0..9; file 2 (later mtime): ids 5..14 → 5 retries, 5 new
    for i, ids in enumerate([range(10), range(5, 15)]):
        f = str(src / f"{i:05d}.parquet")
        spark.createDataFrame(rows(list(ids), i * 30)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"tmp{i}"))
        import os as _os

        data = next(
            x for x in _os.listdir(str(src / f"tmp{i}")) if x.endswith(".parquet")
        )
        _os.rename(str(src / f"tmp{i}" / data), f)
        _os.utime(f, (1_700_000_000 + i * 10,) * 2)

    stream = S.read_event_stream(spark, str(src))
    out = S.dedup_stream(stream, ["event_id"])
    name = S.run_to_memory(out, "dedup_stream_t", output_mode="append")
    got = sorted(r["event_id"] for r in spark.sql(f"SELECT event_id FROM {name}").collect())
    assert got == list(range(15))  # each id exactly once, retries dropped

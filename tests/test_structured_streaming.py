"""Structured Streaming event-time layer: the streaming plans must produce
exactly what the equivalent batch aggregation produces once the finite
source is drained (availableNow trigger)."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.streaming import structured as S

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def event_source(spark, tmp_path_factory):
    """Stage the sf0.001 events table as a 3-file parquet directory —
    producers dropping files is the streaming arrival model."""
    src = tmp_path_factory.mktemp("events_stream")
    table(spark, SF_SMALL, "events").repartition(3).write.mode("overwrite").parquet(str(src / "in"))
    # leave only data files; _SUCCESS etc. are fine for the file source
    return str(src / "in")


def test_tumbling_counts_match_batch(spark, event_source):
    stream = S.tumbling_counts(S.read_event_stream(spark, event_source))
    name = S.run_to_memory(stream, "t_tumbling", output_mode="append")
    got = spark.table(name)

    batch = (
        spark.read.parquet(event_source)
        .groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # watermark may hold back the tail windows in append mode; everything
    # emitted must match batch exactly and cover most of the stream
    assert g.items() <= b.items()
    assert len(g) >= 0.8 * len(b)


def test_session_windows_match_batch(spark, event_source):
    stream = S.session_windows(S.read_event_stream(spark, event_source), gap="30 minutes")
    name = S.run_to_memory(stream, "t_sessions", output_mode="append")
    got = spark.table(name)

    batch = (
        spark.read.parquet(event_source)
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"), "n_events")
    )
    g = {(r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()}
    b = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()}
    assert g.items() <= b.items()
    assert len(g) >= 0.8 * len(b)

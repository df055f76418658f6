"""Event-time analytics on Structured Streaming — watermarks, windowed
aggregations, and micro-batch sinks.

This is the genuinely-streaming counterpart of queries/events_stream.py
(whose batch-SQL versions exist so the DuckDB oracle can check the same
semantics). The reference's streaming layer is timestep-synchronous with
no late data (SURVEY.md §2C); the event-time surface here is the Spark
superset: watermarks bound state, late rows beyond the watermark drop.

Scale posture: a file/Kafka source partitioned by arrival; windowed aggs
shuffle once on (window, key); state store size is bounded by
watermark horizon × key cardinality, independent of total history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, source_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of event rows: producers drop parquet files into
    ``source_dir``; each trigger consumes ``max_files_per_trigger`` files
    (the backpressure knob — doreisa's max_pending_arrays analog)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def tumbling_counts(events: DataFrame, *, minutes: int = 60, watermark: str = "2 hours") -> DataFrame:
    """Per-hour per-type counts with a watermark bounding agg state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_avg(
    events: DataFrame, *, length_min: int = 30, slide_min: int = 10, watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{length_min} minutes", f"{slide_min} minutes").alias("w"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "avg_value", "n_events")
    )


def session_windows(events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows: a session extends while events arrive
    within ``gap`` (F.session_window keeps state per open session only)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_stream_purchase_clicks(
    events: DataFrame, *, horizon_min: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: each purchase matched to the
    same user's clicks within the preceding ``horizon_min`` minutes —
    attribution while both streams are still flowing.

    Both sides carry watermarks and the join predicate bounds their
    event-time distance, so the state store retains only rows inside
    watermark + horizon; older state is dropped. At 100 TB/day this is the
    only viable shape — an unbounded-state stream join never survives.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"), "value")
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (purchases["user_id"] == clicks["c_user"])
        & (clicks["click_ts"] <= purchases["purchase_ts"])
        & (clicks["click_ts"] >= purchases["purchase_ts"] - F.expr(f"INTERVAL {horizon_min} MINUTES"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "user_id", "purchase_id", "purchase_ts", "click_id", "click_ts", "value"
    )


def dedup_stream(
    events: DataFrame,
    keys: "list[str]" = None,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAMING exact dedup — the streaming face of queries/dedup.py:
    each key combination is emitted once; re-arrivals within the
    watermark horizon are dropped by the state store, and the watermark
    lets Spark EVICT keys older than the horizon, so state is bounded by
    (horizon × key arrival rate), never by stream history.

    ``dropDuplicates`` on a stream would keep every key forever (state
    grows without bound — dead at 100 TB/day);
    ``dropDuplicatesWithinWatermark`` is the only shape that survives.
    Exactly-once per key holds for duplicates arriving within the
    horizon of the first occurrence — the contract an ingest pipeline
    (at-least-once delivery, bounded redelivery lag) actually needs."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """CUSTOM stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained across micro-batches — the pattern for
    any accumulator Spark's built-in windowed aggs can't express (session
    ML features, CUSUM/anomaly scores, per-entity model state).

    Each trigger receives only that batch's rows per key plus the key's
    GroupState; it emits the updated running totals (``update`` output
    mode). State is one (bigint, double) pair per user — size is bounded
    by key cardinality, never by history length; with event-time bounds a
    ``GroupStateTimeout.EventTimeTimeout`` would expire idle keys.

    The reference's analog is the user callback owning state across
    iterations of ``run_simulation`` (doreisa/window_api.py:66-119)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_foreach_batch(
    stream: DataFrame,
    batch_fn,
    *,
    timeout_sec: float = 120,
    checkpoint: "str | None" = None,
) -> None:
    """Drive a stream through ``foreachBatch`` — the sink that hands each
    micro-batch to arbitrary user code as a plain DataFrame (doreisa's
    consumption loop handing assembled arrays to the callback,
    window_api.py:101-103). Used for sinks Spark lacks natively (JDBC
    upsert, dedup-merge, multi-table fan-out); the batch DataFrame can be
    written with the full batch API, transactionally per epoch.

    ``checkpoint=None`` (drain-once mode) uses a FRESH checkpoint and
    deletes it afterwards — a reused one would make availableNow skip
    offsets a previous invocation processed. Pass a PERSISTENT
    ``checkpoint`` path for resumable drives: a later call with the same
    path processes only NEW source data, micro-batch ids keep
    increasing, and a batch interrupted mid-sink is REDELIVERED under
    the same id on restart — which is exactly what the commit layer's
    per-id refusal turns into end-to-end exactly-once."""
    import shutil
    import tempfile

    ckpt = checkpoint or tempfile.mkdtemp(prefix="doreisa_fb_ckpt_")
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            # timed out: don't leave the query running in the background
            q.stop()
            # stop() can return while the stream's threads still write the
            # checkpoint — wait for full termination before deleting it,
            # else the dying query races rmtree and logs spurious errors
            q.awaitTermination(30)
    finally:
        if checkpoint is None:
            # the per-run checkpoint is garbage once the query finished
            shutil.rmtree(ckpt, ignore_errors=True)


def run_to_memory(
    stream: DataFrame, query_name: str, *, output_mode: str = "append", timeout_sec: float = 120
):
    """Execute a streaming plan to completion against a finite source,
    returning the in-memory sink table name. Test/driver harness only —
    production sinks are parquet/Kafka via the same writeStream call."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return query_name

"""Event-time windowing: tumbling / sliding / session windows and
sessionization — the batch-SQL-checkable analogs of the Structured
Streaming layer (doreisa_spark.streaming runs the same logic with
readStream + watermarks; the reference's analog is its per-timestep
micro-batching and sliding buffers, doreisa window_api.py:66-119).

Spark's F.window/F.session_window are epoch-aligned; the oracles rebuild
the identical window assignment with date_trunc arithmetic / gaps-and-
islands SQL, so results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.registry import register


@register(
    "stream_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts) AS wstart,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS wend,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sliding_window",
    oracle="""
WITH g AS (
  SELECT *,
         date_trunc('hour', ts)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
           AS grid
  FROM events
), expanded AS (
  SELECT grid AS wstart, value FROM g
  UNION ALL
  SELECT grid - INTERVAL 30 MINUTE AS wstart, value FROM g
)
SELECT wstart, wstart + INTERVAL 1 HOUR AS wend,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM expanded
GROUP BY 1, 2
""",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide (each event lands in
    exactly 2 windows; the oracle materializes the same expansion)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user.

    Spark's session_window merges events strictly <30min apart; window.end is
    last-event-ts + gap. The oracle is the classic gaps-and-islands
    formulation producing the identical sessions."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sessionization_islands",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM flagged
GROUP BY user_id
""",
)
def stream_sessionization_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions-per-user via the lag/gaps-and-islands DataFrame pattern
    (the batch formulation of stateful sessionization)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = ev.select(
        "user_id",
        F.when(gap.isNull() | (gap >= 30 * 60), 1).otherwise(0).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions")
    )

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


@register(
    "stream_funnel_stages",
    extended=True,
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_buy
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), counts AS (
  SELECT (SELECT count(*) FROM v) AS n_view,
         (SELECT count(*) FROM c) AS n_click,
         (SELECT count(*) FROM p) AS n_buy
)
SELECT stage, n_users,
       CAST(n_users AS DOUBLE) / CAST(n_view AS DOUBLE) AS reach
FROM counts, (
  SELECT 1 AS ord, 'view' AS stage FROM counts
  UNION ALL SELECT 2, 'click' FROM counts
  UNION ALL SELECT 3, 'purchase' FROM counts
) s
JOIN (
  SELECT 1 AS ord2, n_view AS n_users FROM counts
  UNION ALL SELECT 2, n_click FROM counts
  UNION ALL SELECT 3, n_buy FROM counts
) n ON n.ord2 = s.ord
""",
)
def stream_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel analysis — the match_recognize-shaped
    query product analytics runs constantly: per user, first `view`,
    first `click` strictly AFTER that view, first `purchase` strictly
    after that click; report users reaching each stage and the reach
    ratio vs stage one.

    Plan shape: three (user_id) min-aggregates chained by broadcast-able
    per-user timestamps — each stage joins the FACT stream against the
    previous stage's one-row-per-user frame on user_id with a strict
    event-time inequality (the ordered-sequence constraint), then
    re-aggregates. At 100 TB every join is keyed on user_id (co-partition
    with the event shuffle); no self-join explosion because each stage
    collapses to one row per user before the next. The reach ratio is an
    integer-count division — bit-exact across engines."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_buy")))
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("stage"), F.col("n_view").alias("n_users")),
                F.struct(F.lit("click").alias("stage"), F.col("n_click").alias("n_users")),
                F.struct(F.lit("purchase").alias("stage"), F.col("n_buy").alias("n_users")),
            )
        ).alias("s"),
        "n_view",
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        F.col("s.n_users").alias("n_users"),
        (F.col("s.n_users").cast("double") / F.col("n_view").cast("double")).alias(
            "reach"
        ),
    )


@register(
    "stream_retention_cohorts",
    extended=True,
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT f.cohort,
       CAST(date_diff('week', f.cohort, a.wk) AS INTEGER) AS week_n,
       count(*) AS n_active
FROM activity a JOIN firsts f ON f.user_id = a.user_id
GROUP BY 1, 2
""",
)
def stream_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix — users grouped by first-activity
    week, counted in each subsequent active week. The standard
    product-analytics triangle, exercising two derived time dimensions
    (cohort week, activity offset) from one event stream.

    Plan: one (user_id) agg for cohorts, one distinct over (user, week) —
    both user_id-keyed, sharing the shuffle; the cohort join is per-user
    (no fan-out), and the final (cohort, week_n) agg is tiny. Week
    offsets are exact integer arithmetic (both weeks are Monday-truncated,
    so the difference is a whole number of weeks in both engines)."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    week_n = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("int")
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort", week_n.alias("week_n"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "stream_resample_ffill",
    extended=True,
    oracle="""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS grid_ts
  FROM bounds
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, max(value) AS mv
  FROM events GROUP BY 1, 2
)
SELECT g.user_id, g.grid_ts,
       last_value(h.mv IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.grid_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM grid g
LEFT JOIN hourly h ON h.user_id = g.user_id AND h.h = g.grid_ts
""",
)
def stream_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a regular hourly grid with forward-fill
    — the gap-filling shape every metrics/monitoring pipeline runs
    (sparse events → dense series). Per user: materialize the hour grid
    between first and last activity (sequence + explode), join the
    hourly max, and carry the last observation forward through empty
    hours (last_value IGNORE NULLS over an unbounded-preceding frame).

    Plan: bounds and hourly aggregates share the user_id shuffle; the
    grid explode is map-only on the tiny bounds frame; the fill window is
    partitioned per user (never all-to-one). hourly uses MAX (order-free)
    so the filled values are bit-deterministic — no summation-order or
    rounding hazards."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("grid_ts"),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.max("value").alias("mv"))
    joined = grid.join(
        hourly,
        (grid["user_id"] == hourly["user_id"]) & (hourly["h"] == grid["grid_ts"]),
        "left",
    ).select(grid["user_id"], "grid_ts", "mv")
    w = (
        W.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id", "grid_ts", F.last("mv", ignorenulls=True).over(w).alias("filled")
    )


@register(
    "stream_anomaly_zscore",
    extended=True,
    oracle="""
WITH stats AS (
  SELECT user_id, ts, value,
         sum(value)  OVER w AS s1,
         sum(value * value) OVER w AS s2,
         count(*) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, ts, value,
       CAST(CASE WHEN n >= 5
                 AND (s2 / n - (s1 / n) * (s1 / n)) > 0
                 AND abs(value - s1 / n)
                     > 2 * sqrt(s2 / n - (s1 / n) * (s1 / n))
            THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM stats
""",
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags — the monitoring-pipeline shape:
    each event compares against the mean/std of its user's PRECEDING 10
    events (frame excludes the current row, so an outlier can't mask
    itself), flagged at |z| > 2 once >= 5 history points exist.

    The std is written as explicit sum/sumsq arithmetic (never a
    black-box stddev aggregate) so both engines evaluate the identical
    operation tree over the identically-ordered frame (ts, event_id — a
    total order), making the integer flags bit-stable. Plan: one user_id
    window, partitioned, frames never materialize per-row state."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, -1)
    )
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    n = F.count(F.lit(1)).over(w)
    var = s2 / n - (s1 / n) * (s1 / n)
    flag = (
        F.when(
            (n >= 5)
            & (var > 0)
            & (F.abs(F.col("value") - s1 / n) > 2 * F.sqrt(var)),
            1,
        )
        .otherwise(0)
        .cast("int")
    )
    return ev.select("user_id", "ts", "value", flag.alias("is_anomaly"))

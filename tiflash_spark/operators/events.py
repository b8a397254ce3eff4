"""Event-stream analytics over the events table.

The reference has no event-time query surface (SURVEY.md §1.6 — its only
stream is Raft ingestion), but these are the batch analogues of Structured
Streaming's windowed aggregations, expressed so the identical DataFrame
code runs under readStream with a watermark:

- tumbling/hourly rollups  → F.window(ts, ...) / date_trunc
- sessionization           → gap-based: lag + cumulative session counter
- funnel                   → conditional min-timestamps per user, ordered

All oracle-checked; all single-shuffle-per-window-spec shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window rollup per event type (streaming-equivalent:
    readStream + withWatermark + F.window — same agg body)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_TUMBLING_SQL = """
SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): classic lag + running
    sum of session-start flags. One shuffle on user_id; both the lag and
    the cumulative sum ride the same (user_id, ts) sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_sessions = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return (
        with_sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_events"),
            F.round(F.avg("duration_s"), 4).alias("avg_duration_s"),
            F.max("n_events").alias("max_events"),
        )
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         -- truncate to whole seconds like Spark's unix_timestamp, so the
         -- 1800 s gap threshold bites identically at fractional boundaries
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT)
                      - CAST(FLOOR(EPOCH(CAST(LAG(ts) OVER w AS TIMESTAMP))) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         COUNT(*) AS n_events,
         ROUND(SUM(value), 4) AS session_value,
         CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) - CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS duration_s
  FROM sessions
  GROUP BY 1, 2
)
SELECT COUNT(*) AS n_sessions,
       ROUND(AVG(n_events), 6) AS avg_events,
       ROUND(AVG(duration_s), 4) AS avg_duration_s,
       MAX(n_events) AS max_events
FROM per_session
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view→click→purchase: per-user ordered milestone
    timestamps via conditional aggregation (one shuffle), then funnel
    counts. The standard product-analytics query at any scale."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("t_click") > F.col("t_view")) & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_buy
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
         AS n_full_funnel
FROM per_user
"""


def events_json_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + JSON extraction + join back to an aggregate — the
    semi-structured enrichment pattern (props payload → typed column)."""
    e = load_table(spark, sf_dir, "events")
    typed = e.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        "value",
    )
    return (
        typed.groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.corr("k", "value"), 6).alias("k_value_corr"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_ENRICH_SQL = """
SELECT event_type,
       ROUND(AVG(k), 6) AS avg_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       ROUND(CORR(k, value), 6) AS k_value_corr
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
  FROM events
) t
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "events_tumbling_window": events_tumbling_window,
    "events_sessionize": events_sessionize,
    "events_funnel": events_funnel,
    "events_json_enrich": events_json_enrich,
}

ORACLE = {
    "events_tumbling_window": EVENTS_TUMBLING_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_json_enrich": EVENTS_JSON_ENRICH_SQL,
}


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native SessionWindow operator in batch mode (the same
    operator Structured Streaming uses for stateful sessionization —
    SURVEY.md §2.6): session_window(ts, gap) per user, then a global
    summary. Semantics note: native windows merge while the next event
    starts strictly BEFORE prev_ts + gap, so a gap of exactly 1800 s
    starts a new session — the oracle flags starts with >= 1800."""
    e = load_table(spark, sf_dir, "events")
    per_session = (
        e.groupBy("user_id", F.session_window("ts", "1800 seconds").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )
    return per_session.groupBy().agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.sum("session_value"), 4).alias("total_value"),
    )


EVENTS_SESSION_WINDOW_NATIVE_SQL = """
WITH flagged AS (
  SELECT user_id, value, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR EPOCH_US(CAST(ts AS TIMESTAMP))
                      - EPOCH_US(CAST(LAG(ts) OVER w AS TIMESTAMP)) >= 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  -- the running sum MUST repeat the event order: a frame with no ORDER
  -- BY leaves intra-partition row order engine-chosen, and DuckDB's
  -- parallel window occasionally delivered rows out of event order,
  -- splitting one session into two (observed: 95466 vs 95465 at sf0.1)
  SELECT user_id, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         ROUND(SUM(value), 4) AS session_value
  FROM sessions GROUP BY 1, 2
)
SELECT COUNT(*) AS n_sessions,
       ROUND(AVG(n_events), 6) AS avg_events,
       MAX(n_events) AS max_events,
       ROUND(SUM(session_value), 4) AS total_value
FROM per_session
"""

QUERIES["events_session_window_native"] = events_session_window_native
ORACLE["events_session_window_native"] = EVENTS_SESSION_WINDOW_NATIVE_SQL


def events_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event TIME: per user, trailing-one-hour event count
    and value sum at every event — the reference's RANGE frame with an
    auxiliary comparison column (WindowDescription.h:87-94: non-numeric
    ORDER BY gets a comparison column; here epoch seconds is exactly that
    auxiliary column, making Spark's numeric rangeBetween applicable to
    timestamps). Rolled up per user so the result is compact; the frame
    math is pinned by max/sum of the trailing stats."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    epoch = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3599, 0)  # trailing hour, inclusive
    )
    trail = e.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("trail_n"),
        F.sum("value").over(w).alias("trail_v"),
    )
    return (
        trail.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("trail_n").cast("long").alias("max_trail_n"),
            F.round(F.sum("trail_v"), 2).alias("sum_trail_v"),
        )
        .orderBy("user_id")
    )


EVENTS_TIME_RANGE_SQL = """
WITH trail AS (
  SELECT user_id,
         COUNT(*) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT)
           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS trail_n,
         SUM(value) OVER (
           PARTITION BY user_id
           ORDER BY CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT)
           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS trail_v
  FROM events
  WHERE user_id < 200
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(trail_n) AS BIGINT) AS max_trail_n,
       ROUND(SUM(trail_v), 2) AS sum_trail_v
FROM trail
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["events_time_range_window"] = events_time_range_window
ORACLE["events_time_range_window"] = EVENTS_TIME_RANGE_SQL

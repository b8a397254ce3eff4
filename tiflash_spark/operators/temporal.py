"""Temporal joins: as-of join and interval (range) join.

The reference has no dedicated as-of/range operators — TiDB lowers such
queries to NonEquiJoin / CartesianJoin over sorted streams
(reference join surface: dbms/src/Flash/Coprocessor/DAGUtils.cpp join
types; Cross+theta handled in operators/joins.py). A training-data /
event-analytics engine needs both as first-class, *scale-safe* ops, so
they are implemented here Spark-first:

- ``asof_join`` — NOT a join at all on Spark: union both sides with a
  side marker, one window pass per key carries the latest right-side row
  forward (``last(..., ignorenulls=True)``), then keep left rows. ONE
  shuffle on the key, zero row blowup, no range predicate — the plan
  that survives a billion events per key-day. (A sort-merge band join
  would re-sort per range; the union trick rides a single sort.)

- ``range_join_binned`` — interval containment without an equi-key:
  bin the time axis, explode each interval to the bins it covers, then
  an EQUI-join on the bin plus an exact residual filter. Shuffle volume
  is O(rows + intervals × bins-per-interval); no cross product ever
  materializes. This is the classic bin/bucket range-join used by every
  distributed engine that lacks an interval index.

Correctness oracle: DuckDB's native ``ASOF LEFT JOIN`` and its IEJoin
inequality join — the Spark plans must reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table

__all__ = ["asof_join", "asof_join_single_source", "range_join_binned"]


def _asof_attach(
    u: DataFrame,
    left_cols: tuple[str, ...],
    right_ts: str,
    right_cols: tuple[str, ...],
    prefix: str,
    direction: str,
    tolerance_s: int | None,
) -> DataFrame:
    """Shared tail of the as-of join: ``u`` is the tagged union frame
    (_k, _ord, _is_left, _r struct, _l_<c> …). One window over _k carries
    the latest right payload onto each left row; see asof_join for the
    ordering contract."""
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts → inclusive match
        w = Window.partitionBy("_k").orderBy(
            F.col("_ord").asc(), F.col("_is_left").asc()
        )
    else:
        w = Window.partitionBy("_k").orderBy(
            F.col("_ord").desc(), F.col("_is_left").asc()
        )
    carried = F.last("_r", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_match", carried)
    if tolerance_s is not None:
        gap = (
            F.unix_timestamp(F.col("_ord"))
            - F.unix_timestamp(F.col("_match")["_ts"])
            if direction == "backward"
            else F.unix_timestamp(F.col("_match")["_ts"])
            - F.unix_timestamp(F.col("_ord"))
        )
        matched = matched.withColumn(
            "_match", F.when(gap <= tolerance_s, F.col("_match"))
        )
    return (
        matched
        .filter(F.col("_is_left"))
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left_cols],
            *[F.col("_match")[c].alias(f"{prefix}{c}") for c in ("_ts", *right_cols)],
        )
        .withColumnRenamed(f"{prefix}_ts", f"{prefix}{right_ts}")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    prefix: str = "ref_",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the single right row
    with the largest ``right_ts`` <= ``left_ts`` (direction='backward',
    inclusive — DuckDB/pandas ``merge_asof`` semantics) or the smallest
    ``right_ts`` >= ``left_ts`` ('forward') within the same ``by`` key.
    Unmatched left rows keep NULLs. ``tolerance_s`` bounds the match
    age like pandas ``merge_asof(tolerance=...)``: a carried right row
    further than that many seconds from the left timestamp reverts to
    NULLs (evaluated as a post-carry expression — the single-window plan
    is unchanged).

    One shuffle (window over ``by``), no row blowup: the union carries
    each right row once, and the carried payload is a single struct so
    all attached columns always come from the SAME right row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r2 = right.select(
        F.col(by).alias("_k"),
        F.col(right_ts).alias("_ord"),
        F.lit(False).alias("_is_left"),
        payload.alias("_r"),
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}") for t in left.schema.fields],
    )
    l2 = left.select(
        F.col(by).alias("_k"),
        F.col(left_ts).alias("_ord"),
        F.lit(True).alias("_is_left"),
        F.lit(None).cast(r2.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = l2.unionByName(r2)
    return _asof_attach(
        u, tuple(left.columns), right_ts, right_cols, prefix, direction, tolerance_s
    )


def asof_join_single_source(
    source: DataFrame,
    left_pred: Column,
    right_pred: Column,
    by: str,
    left_ts: str,
    right_ts: str,
    left_cols: tuple[str, ...],
    right_cols: tuple[str, ...],
    prefix: str = "ref_",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """``asof_join(source.filter(left_pred).select(*left_cols),
    source.filter(right_pred), …)`` — row-identical output — built from
    ONE scan of ``source`` instead of two.

    When left and right legs are predicates over the same table (the
    common shape: "each click vs the same user's last error"), the
    two-frame form scans the table twice just to tag rows before the
    union. Here each source row surviving ``left_pred OR right_pred``
    explodes to its side tag(s) directly (a row matching BOTH predicates
    appears on both sides, exactly like the two separate filters), so the
    physical plan reads the table once — the window shuffle is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    sides = F.filter(
        F.array(F.when(left_pred, F.lit(True)), F.when(right_pred, F.lit(False))),
        lambda x: x.isNotNull(),
    )
    u = (
        source.filter(left_pred | right_pred)
        .select("*", F.explode(sides).alias("_is_left"))
        .select(
            F.col(by).alias("_k"),
            F.when(F.col("_is_left"), F.col(left_ts))
            .otherwise(F.col(right_ts))
            .alias("_ord"),
            F.col("_is_left"),
            F.when(~F.col("_is_left"), payload).alias("_r"),
            *[F.when(F.col("_is_left"), F.col(c)).alias(f"_l_{c}") for c in left_cols],
        )
    )
    return _asof_attach(
        u, tuple(left_cols), right_ts, right_cols, prefix, direction, tolerance_s
    )


def range_join_binned(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 600,
) -> DataFrame:
    """Inner-join left rows to every interval containing their timestamp
    (``start <= ts < end``), with NO equi-key — the no-key range join.

    Left rows get one bin (their own); each interval explodes to the bins
    it covers (ceil(len/bin)+1 rows, small for bounded intervals); the
    join is a plain equi-join on the bin followed by the exact residual
    range filter. Every (row, interval) pair meets in exactly one bin, so
    no dedup is needed. Pick ``bin_seconds`` ≈ typical interval length:
    shuffle volume stays O(n + m·len/bin) instead of O(n·m).
    """
    lb = left.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                # end is exclusive but a row in end's bin can still precede
                # it — cover through the bin holding the last included µs
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return lb.join(ib, "_bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_bin")


# --- driver queries ---------------------------------------------------------


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click event annotated with the same user's most recent prior
    (or simultaneous) error event — the canonical as-of join. Matches
    DuckDB's native ASOF LEFT JOIN exactly, including unmatched clicks."""
    e = load_table(spark, sf_dir, "events")
    # both legs are predicates over the SAME table: the single-source
    # form reads events once (plan: 1 scan, was 2) — output row-identical
    # to the two-frame asof_join (pinned in tests/test_temporal.py)
    out = asof_join_single_source(
        e.select("event_id", "user_id", "ts", "value", "event_type"),
        left_pred=F.col("event_type") == "click",
        right_pred=F.col("event_type") == "error",
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=("event_id", "user_id", "ts", "value"),
        right_cols=("value",),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ref_ts"),
        F.round("ref_value", 2).alias("ref_value"),
        F.when(
            F.col("ref_ts").isNotNull(),
            (F.unix_timestamp("ts") - F.unix_timestamp("ref_ts")).cast("long"),
        ).alias("gap_s"),
    ).orderBy("event_id")


ASOF_JOIN_EVENTS_SQL = """
SELECT a.event_id,
       a.user_id,
       a.ts,
       b.ts AS ref_ts,
       ROUND(b.value, 2) AS ref_value,
       CASE WHEN b.ts IS NOT NULL
            THEN CAST(DATE_DIFF('second', b.ts, a.ts) AS BIGINT) END AS gap_s
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                WHERE event_type = 'error') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY a.event_id
"""


def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every error event opens a 10-minute incident window; count ALL
    events (any user — deliberately no equi-key) falling inside each
    window and sum their value. A pure interval-containment join that the
    binned plan answers without a cross product."""
    e = load_table(spark, sf_dir, "events")
    incidents = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("inc_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    hits = range_join_binned(
        e.select("event_id", "ts", "value"),
        incidents,
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bin_seconds=600,
    )
    return (
        hits.groupBy("inc_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("inc_id")
    )


RANGE_JOIN_INCIDENTS_SQL = """
SELECT i.inc_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2) AS total_value
FROM (SELECT event_id AS inc_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'error') i
JOIN events e ON e.ts >= i.w_start AND e.ts < i.w_end
GROUP BY i.inc_id
ORDER BY i.inc_id
"""


QUERIES = {
    "asof_join_events": asof_join_events,
    "range_join_incidents": range_join_incidents,
}
ORACLE = {
    "asof_join_events": ASOF_JOIN_EVENTS_SQL,
    "range_join_incidents": RANGE_JOIN_INCIDENTS_SQL,
}


def events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream onto a regular hourly grid with
    forward-fill — the time-series gap-filling operator (absent in the
    reference, which leaves time bucketing to TiDB; first-class in every
    time-series engine). Plan: one agg shuffle for the hourly rollup, a
    generated grid (O(span x types) rows — bounded by calendar time, not
    data volume), a left join, and one carry-forward window per type.
    At extreme spans partition the fill by (type, day) with a per-day
    seed row to keep windows bounded."""
    e = load_table(spark, sf_dir, "events")
    # the hourly rollup is O(types × hours) rows and every other input
    # derives from it: the grid bounds (date_trunc is monotonic, so
    # min/max of h ≡ date_trunc(min/max ts)) and the type list (groupBy
    # preserves every type). Persisting it makes the query ONE event
    # scan — un-cached, the bounds and distinct-type branches each
    # re-scanned the raw events (3 corpus passes).
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.avg("value").alias("av"),
        )
        .persist()
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
        )
        .crossJoin(hourly.select("event_type").distinct())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["event_type", "h"], "left")
    return (
        joined.select(
            "event_type",
            "h",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            # +1e-9 before ROUND in BOTH engines: the ffill average is a
            # float mean that can land exactly on a .xxxx5 half-way point
            # where Spark (HALF_UP on doubles) and DuckDB disagree (seen
            # at sf0.1); the epsilon pushes every half-way point one way
            # consistently, and engine ulp differences (~1e-14 here)
            # cannot cross it
            F.round(
                F.last("av", ignorenulls=True).over(w) + F.lit(1e-9), 4
            ).alias("avg_value_ffill"),
            F.col("n_events").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "h")
    )


EVENTS_RESAMPLE_SQL = """
WITH bounds AS (
  SELECT DATE_TRUNC('hour', MIN(ts)) AS lo, DATE_TRUNC('hour', MAX(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
),
hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_events, AVG(value) AS av
  FROM events GROUP BY 1, 2
)
SELECT g.event_type, g.h,
       CAST(COALESCE(hr.n_events, 0) AS BIGINT) AS n_events,
       ROUND(LAST_VALUE(hr.av IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS UNBOUNDED PRECEDING) + 1e-9, 4) AS avg_value_ffill,
       hr.n_events IS NULL AS is_gap
FROM grid g LEFT JOIN hourly hr
  ON g.event_type = hr.event_type AND g.h = hr.h
ORDER BY g.event_type, g.h
"""

QUERIES["events_resample"] = events_resample
ORACLE["events_resample"] = EVENTS_RESAMPLE_SQL

"""Window operators — the reference's 7 window functions + frame-bounded aggs.

Reference (SURVEY.md §2.3): window_func_map (DAGUtils.cpp:43-51) = rank,
dense_rank, row_number, lead, lag, first_value, last_value
(WindowFunctions/IWindowFunction.cpp:71-382), plus frame-bounded
min/max/count/sum/avg (AggregateFunctionMinMaxWindow.cpp). Frames: ROWS and
RANGE with offset/unbounded/current boundaries
(Interpreters/WindowDescription.h:44-94). The separate window-Sort executor
(PhysicalWindowSort) is implicit in Window.partitionBy().orderBy().

Scale notes: Spark shuffles once per distinct (partitionBy, orderBy) pair and
sorts within partitions — same physical shape as TiFlash's fine-grained
shuffle + per-partition WindowTransformAction. All window specs below share
one partitioning so Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number / lead / lag / first_value / last_value
    over one partitioning — all seven reference window functions."""
    o = load_table(spark, sf_dir, "orders")
    # deterministic full ordering inside each customer partition
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
            F.lead("o_orderkey", 1).over(w).alias("next_order"),
            F.lag("o_orderkey", 1).over(w).alias("prev_order"),
            F.first("o_orderkey").over(w).alias("top_order"),
            F.last("o_orderkey").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("bottom_order"),
        )
        .filter(F.col("rn") <= 3)
    )


WINDOW_RANKING_SQL = """
SELECT * FROM (
  SELECT
    o_custkey, o_orderkey, o_totalprice,
    RANK()       OVER w AS rnk,
    DENSE_RANK() OVER w AS drnk,
    ROW_NUMBER() OVER w AS rn,
    LEAD(o_orderkey, 1) OVER w AS next_order,
    LAG(o_orderkey, 1)  OVER w AS prev_order,
    FIRST_VALUE(o_orderkey) OVER w AS top_order,
    LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_order
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) t
WHERE rn <= 3
"""


def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame running aggregates: moving sum/avg/min/max/count over the
    last 3 events per user (offset preceding → current)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(wo).alias("seq"),
            F.round(F.sum("value").over(w), 4).alias("mov_sum"),
            F.round(F.avg("value").over(w), 4).alias("mov_avg"),
            F.round(F.min("value").over(w), 4).alias("mov_min"),
            F.round(F.max("value").over(w), 4).alias("mov_max"),
            F.count("value").over(w).alias("mov_cnt"),
        )
        .filter(F.col("user_id") < 200)
    )


WINDOW_ROWS_FRAME_SQL = """
SELECT user_id, event_id,
  ROW_NUMBER() OVER wo AS seq,
  ROUND(SUM(value) OVER w, 4) AS mov_sum,
  ROUND(AVG(value) OVER w, 4) AS mov_avg,
  ROUND(MIN(value) OVER w, 4) AS mov_min,
  ROUND(MAX(value) OVER w, 4) AS mov_max,
  COUNT(value) OVER w AS mov_cnt
FROM events
WHERE user_id < 200
WINDOW
  w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wo AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame aggregates over a numeric ORDER BY key (reference uses an
    auxiliary comparison column for RANGE — WindowDescription.h:87-94; Spark
    handles numeric ranges natively): total value of orders within ±5000 of
    each order's totalprice inside one customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-5000, 5000)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("near_total"),
    ).filter(F.col("o_custkey") < 300)


WINDOW_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
  COUNT(*) OVER w AS n_near,
  ROUND(SUM(o_totalprice) OVER w, 2) AS near_total
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING)
"""


def window_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (UNBOUNDED PRECEDING → CURRENT ROW) and full-partition
    shares: each nation's share of its region's customer balance."""
    c = load_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(F.sum("c_acctbal").alias("bal"))
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("c_nationkey").rowsBetween(Window.unboundedPreceding, 0)
    return per_nation.select(
        "c_nationkey",
        F.round("bal", 2).alias("bal"),
        F.round(F.sum("bal").over(w_cum), 2).alias("running_bal"),
        F.round(F.col("bal") / F.sum("bal").over(w_all) * 100, 6).alias("pct_of_total"),
    ).orderBy("c_nationkey")


WINDOW_UNBOUNDED_SQL = """
SELECT c_nationkey,
  ROUND(bal, 2) AS bal,
  ROUND(SUM(bal) OVER (ORDER BY c_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
    AS running_bal,
  ROUND(bal / SUM(bal) OVER () * 100, 6) AS pct_of_total
FROM (SELECT c_nationkey, SUM(c_acctbal) AS bal FROM customer GROUP BY c_nationkey) t
ORDER BY c_nationkey
"""


QUERIES = {
    "window_ranking": window_ranking,
    "window_rows_frame": window_rows_frame,
    "window_range_frame": window_range_frame,
    "window_unbounded": window_unbounded,
}

ORACLE = {
    "window_ranking": WINDOW_RANKING_SQL,
    "window_rows_frame": WINDOW_ROWS_FRAME_SQL,
    "window_range_frame": WINDOW_RANGE_FRAME_SQL,
    "window_unbounded": WINDOW_UNBOUNDED_SQL,
}


def window_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions beyond the reference's seven — ntile, percent_rank,
    cume_dist, nth_value (SURVEY.md §2.3 notes TiFlash lacks these; they're
    free Spark surface, included like the set ops)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("second_order"),
    )


WINDOW_EXTENDED_SQL = """
SELECT o_custkey, o_orderkey,
  NTILE(4) OVER w AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS cdist,
  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WHERE o_custkey < 500
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""

QUERIES["window_extended"] = window_extended
ORACLE["window_extended"] = WINDOW_EXTENDED_SQL

"""Expand / grouping-sets operators — ROLLUP, CUBE, GROUPING SETS + grouping().

Reference (SURVEY.md §2.1 row 10): tipb Expand/Expand2 replicate each input
row once per grouping set (dbms/src/Interpreters/Expand.cpp,
Expand2.cpp; grouping() marker in Functions/FunctionsGrouping.cpp); e2e test
tests/fullstack-test/mpp/rollup_tpcds.test. Catalyst lowers
rollup/cube/groupingSets to its own Expand node — identical physical shape.

NULL-vs-subtotal disambiguation uses F.grouping(), exactly like the
reference's grouping function over the Expand output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) with grouping() markers —
    port of the rollup_tpcds.test shape onto the lineitem table."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice), 4) AS avg_price,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — ((flag, status), (flag), ()) — via SQL so
    Catalyst emits the exact Expand the reference's Expand2 would."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_shipmode_grp AS ship_grp, n, sum_price, g1, g2 FROM (
          SELECT l_returnflag,
                 l_linestatus AS l_shipmode_grp,
                 COUNT(*) AS n,
                 ROUND(SUM(l_extendedprice), 2) AS sum_price,
                 CAST(GROUPING(l_returnflag) AS INT) AS g1,
                 CAST(GROUPING(l_linestatus) AS INT) AS g2
          FROM _gs_lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ) t
        ORDER BY g1, g2, l_returnflag, ship_grp
        """
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_shipmode_grp AS ship_grp, n, sum_price, g1, g2 FROM (
  SELECT l_returnflag,
         l_linestatus AS l_shipmode_grp,
         COUNT(*) AS n,
         ROUND(SUM(l_extendedprice), 2) AS sum_price,
         CAST(GROUPING(l_returnflag) AS INT) AS g1,
         CAST(GROUPING(l_linestatus) AS INT) AS g2
  FROM lineitem
  GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
) t
ORDER BY g1, g2, l_returnflag, ship_grp
"""


QUERIES = {
    "rollup_revenue": rollup_revenue,
    "cube_orders": cube_orders,
    "grouping_sets": grouping_sets_mixed,
}

ORACLE = {
    "rollup_revenue": ROLLUP_SQL,
    "cube_orders": CUBE_SQL,
    "grouping_sets": GROUPING_SETS_SQL,
}

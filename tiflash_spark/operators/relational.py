"""Core relational operators: scan / filter / project / limit / TopN / agg.

Reference executors (SURVEY.md §2.1 rows 1-6):
- TableScan        → dbms/src/Flash/Planner/PhysicalPlan.cpp:196-203
- Selection        → PhysicalPlan.cpp:111-119 (fused into scan = pushdown)
- Projection       → PhysicalPlan.cpp:172-175
- Limit            → PhysicalPlan.cpp:103-106
- TopN             → PhysicalPlan.cpp:107-110 (partial sort + merge)
- Aggregation      → PhysicalPlan.cpp:121-132, Interpreters/Aggregator.cpp

Spark-first: all six are single DataFrame primitives; Catalyst fuses the
filter into the parquet scan (PushedFilters), prunes columns (ReadSchema),
plans TopN as TakeOrderedAndProject, and runs aggregation as
partial → shuffle-by-key → final with spill — the same partial/final split
TiFlash does via Aggregator::mergeAndConvertToBlocks.

Scale notes: q1-style aggregations group on low-cardinality keys, so the
map-side partial agg collapses ~all rows before the shuffle; the shuffle
volume is O(#groups × #tasks), independent of table size — this plan holds
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter(date) → project(arith) → agg → sort.

    Mirrors the reference's canonical AutoFDO workload query (go-tpc tpch q1,
    release-linux-llvm/scripts/perf-autofdo-llvm.py:196-199).
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  ROUND(AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q2_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopN: orderBy + limit → Catalyst TakeOrderedAndProject.

    Reference: PhysicalTopN (per-stream partial sort, then merge) —
    dbms/src/Operators/PartialSortTransformOp.h:24, MergeSortTransformOp.h:27.
    Tie-broken by the unique o_orderkey so the LIMIT frontier is deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q2_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q3_filter_project_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection + Projection + Limit with expression compute.

    The filter and the two-column read schema both reach the parquet scan
    (late materialization ≈ reference LateMaterializationBlockInputStream.h:31
    is Parquet column-index pushdown here). LIMIT over a filter is made
    deterministic by selecting an ordered keyed prefix instead of an arbitrary
    limit: predicate on unique key keeps it a pure scan-range.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_orderkey") < 500) & (F.col("l_discount") > 0.02))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            (F.col("l_quantity").cast("long")).alias("qty_int"),
        )
    )


Q3_SQL = """
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
  CAST(l_quantity AS BIGINT) AS qty_int
FROM lineitem
WHERE l_orderkey < 500 AND l_discount > 0.02
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side predicate + ungrouped agg (StreamAgg).

    Reference: StreamAgg is only ever used for empty group-by
    (PhysicalPlan.cpp:121-122); Spark plans this as partial-agg → single
    final, no hash table at all. All three predicates push into the scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full DAG aggregate surface in one query (SURVEY.md §2.2):
    count / sum / avg / min / max / count(distinct) / first_row.

    Reference impls: dbms/src/AggregateFunctions/AggregateFunction{Count,Sum,
    Avg,MinMaxAny}.cpp; distinct via countDistinct (DAGUtils.cpp:88).
    first_row needs a deterministic row → min_by on the unique line id.
    """
    l = load_table(spark, sf_dir, "lineitem")
    line_id = F.col("l_orderkey") * 16 + F.col("l_linenumber")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count("l_quantity").alias("cnt_col"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.countDistinct("l_suppkey").alias("ndv_supp"),
            F.min_by("l_partkey", line_id).alias("first_part"),
            F.round(F.min("l_discount") + F.max("l_tax"), 4).alias("min_max_mix"),
        )
        .orderBy("l_returnflag")
    )


AGG_FUNCTIONS_SQL = """
SELECT
  l_returnflag,
  COUNT(*) AS cnt,
  COUNT(l_quantity) AS cnt_col,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(AVG(l_extendedprice), 4) AS avg_price,
  MIN(l_shipdate) AS min_ship,
  MAX(l_shipdate) AS max_ship,
  COUNT(DISTINCT l_suppkey) AS ndv_supp,
  MIN_BY(l_partkey, l_orderkey * 16 + l_linenumber) AS first_part,
  ROUND(MIN(l_discount) + MAX(l_tax), 4) AS min_max_mix
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TiDB's statistical/bitwise aggregate surface (SURVEY.md §2.2;
    reference AggregateFunctionsStatisticsSimple.h, bit aggregates via
    TiDB): VAR_POP/VAR_SAMP/STDDEV_POP/STDDEV_SAMP, BIT_AND/OR/XOR, and
    exact interpolated PERCENTILE (TiDB PERCENTILE_CONT). All map-side
    combinable built-ins — one shuffle on the group key."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            F.round(F.var_pop("l_quantity"), 4).alias("var_p"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_s"),
            F.round(F.stddev_pop("l_extendedprice"), 4).alias("std_p"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_s"),
            F.bit_and(F.col("l_linenumber")).alias("band"),
            F.bit_or(F.col("l_linenumber")).alias("bor"),
            F.bit_xor(F.col("l_linenumber")).alias("bxor"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        )
        .orderBy("l_linestatus")
    )


AGG_FUNCTIONS_EXTENDED_SQL = """
SELECT
  l_linestatus,
  ROUND(VAR_POP(l_quantity), 4) AS var_p,
  ROUND(VAR_SAMP(l_quantity), 4) AS var_s,
  ROUND(STDDEV_POP(l_extendedprice), 4) AS std_p,
  ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_s,
  BIT_AND(l_linenumber) AS band,
  BIT_OR(l_linenumber) AS bor,
  BIT_XOR(l_linenumber) AS bxor,
  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
  ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupConcat with ORDER BY + separator, and the DISTINCT variant.

    Reference: AggregateFunctionGroupConcat.h (groupArray + sort/sep),
    DISTINCT via groupUniqArray (DAGUtils.cpp:89). Spark-first:
    concat_ws ∘ sort_array ∘ collect_list / collect_set — stays JVM-side.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.concat_ws(",", F.sort_array(F.collect_set(F.substring("n_name", 1, 1)))).alias(
                "initials"
            ),
        )
        .orderBy("r_name")
    )


GROUP_CONCAT_SQL = """
SELECT
  r_name,
  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
  STRING_AGG(DISTINCT SUBSTRING(n_name, 1, 1), ',' ORDER BY SUBSTRING(n_name, 1, 1)) AS initials
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — expressed by TiDB as group-by (no Distinct executor,
    SURVEY.md §2.1); Spark's dropDuplicates is the same HashAggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


def set_operations_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT surface (TiDB-side in the reference —
    SURVEY.md §2.1 'Set operations'; free Spark built-ins here): the
    literal chained form, 4+ full-width shuffles of the same projection.
    Kept as the set-op API surface; the driver query uses the one-shuffle
    rewrite below (tests pin both forms equal)."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    medium = o.filter(F.col("o_orderpriority") == "3-MEDIUM").select("o_custkey")
    result = big.intersect(urgent).union(big.intersect(medium)).exceptAll(
        big.intersect(urgent).intersect(big.intersect(medium))
    )
    return result.distinct().orderBy("o_custkey")


def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as set_operations_chained — (big∩urgent) ∪ (big∩medium);
    the EXCEPT ALL leg only strips the duplicate copy the UNION ALL
    introduces, so the chain reduces to big ∧ (urgent ∨ medium) — planned
    scale-first: ONE pass of conditional aggregation over orders (map-side
    partial max flags, one shuffle on o_custkey) instead of 4+
    distinct/intersect shuffles. The oracle stays the INTERSECT/EXCEPT
    formulation, proving the rewrite."""
    o = load_table(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max((F.col("o_totalprice") > 100000).cast("int")).alias("big"),
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("urg"),
        F.max((F.col("o_orderpriority") == "3-MEDIUM").cast("int")).alias("med"),
    )
    return (
        flags.filter(
            (F.col("big") == 1) & ((F.col("urg") == 1) | (F.col("med") == 1))
        )
        .select("o_custkey")
        .orderBy("o_custkey")
    )


SET_OPERATIONS_SQL = """
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     medium AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '3-MEDIUM'),
     a AS (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent),
     b AS (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM medium),
     u AS (SELECT o_custkey FROM a UNION ALL SELECT o_custkey FROM b),
     inboth AS (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
SELECT DISTINCT o_custkey
FROM (SELECT o_custkey FROM u EXCEPT ALL SELECT o_custkey FROM inboth) t
ORDER BY o_custkey
"""


def having_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING over a scalar-subquery threshold (TPC-H Q22 shape):
    customers with above-average account balance, order counts per segment."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("a"))
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a")).drop("a")
    return (
        rich.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("num_rich"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .filter(F.col("num_rich") > 10)
        .orderBy("c_mktsegment")
    )


HAVING_SUBQUERY_SQL = """
SELECT
  c_mktsegment,
  COUNT(*) AS num_rich,
  ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
GROUP BY c_mktsegment
HAVING COUNT(*) > 10
ORDER BY c_mktsegment
"""


def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTESource/CTESink: materialize a shared CTE once, read it twice.

    Reference: dbms/src/Operators/CTE.cpp, Flash/Mpp/CTEManager.cpp
    (PhysicalPlan.cpp:244-256). Spark-first: one DataFrame reused by two
    consumers — Catalyst reuses the exchange; .cache() would pin it, but at
    100 TB a shuffle-reuse is cheaper than an RDD cache.
    """
    l = load_table(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("order_total"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    hi = per_order.filter(F.col("order_total") > 200000)
    lo = per_order.filter(F.col("n_lines") <= 2)
    return (
        hi.select("l_orderkey", F.lit("big").alias("bucket"))
        .union(lo.select("l_orderkey", F.lit("small").alias("bucket")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


CTE_REUSE_SQL = """
WITH per_order AS (
  SELECT l_orderkey, ROUND(SUM(l_extendedprice), 2) AS order_total, COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT bucket, COUNT(*) AS n FROM (
  SELECT l_orderkey, 'big' AS bucket FROM per_order WHERE order_total > 200000
  UNION ALL
  SELECT l_orderkey, 'small' AS bucket FROM per_order WHERE n_lines <= 2
) t
GROUP BY bucket
ORDER BY bucket
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q2_topn": q2_topn,
    "q3_filter_project": q3_filter_project_limit,
    "q6_forecast_revenue": q6_forecast_revenue,
    "agg_functions": agg_functions,
    "agg_functions_extended": agg_functions_extended,
    "group_concat": group_concat,
    "distinct": distinct_op,
    "set_operations": set_operations,
    "having_subquery": having_subquery,
    "cte_reuse": cte_reuse,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q2_topn": Q2_SQL,
    "q3_filter_project": Q3_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "agg_functions": AGG_FUNCTIONS_SQL,
    "agg_functions_extended": AGG_FUNCTIONS_EXTENDED_SQL,
    "group_concat": GROUP_CONCAT_SQL,
    "distinct": DISTINCT_SQL,
    "set_operations": SET_OPERATIONS_SQL,
    "having_subquery": HAVING_SUBQUERY_SQL,
    "cte_reuse": CTE_REUSE_SQL,
}


def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupConcat with ORDER BY a *different* column than the value —
    the reference sorts the collected array by the order-by spec before
    joining (AggregateFunctionGroupConcat.h). Spark-first: collect structs
    (ord, val), sort_array on the struct (lexicographic on fields), then
    project the value out — still one aggregation, JVM-side."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    per_nation = (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
    )
    # nations ordered by descending balance inside each region
    ordered_struct = F.sort_array(
        F.collect_list(F.struct((-F.col("bal")).alias("o"), F.col("n_name").alias("v")))
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.transform(ordered_struct, lambda s: s["v"])).alias(
                "nations_by_wealth"
            ),
            F.round(F.sum("bal"), 2).alias("region_bal"),
        )
        .orderBy("n_regionkey")
    )


GROUP_CONCAT_ORDERED_SQL = """
WITH per_nation AS (
  SELECT c_nationkey, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS bal
  FROM customer GROUP BY c_nationkey
)
SELECT n_regionkey,
       STRING_AGG(n_name, ',' ORDER BY -bal, n_name) AS nations_by_wealth,
       ROUND(SUM(bal), 2) AS region_bal
FROM per_nation JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_regionkey
ORDER BY n_regionkey
"""

QUERIES["group_concat_ordered"] = group_concat_ordered
ORACLE["group_concat_ordered"] = GROUP_CONCAT_ORDERED_SQL

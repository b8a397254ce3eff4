"""Join operators — TiFlash's full join-kind matrix on Spark.

Reference (SURVEY.md §2.1 row 7): hash join only, kinds from
dbms/src/Parsers/ASTTablesInSelectQuery.h:94-121 — Inner, LeftOuter,
RightOuter, Semi, Anti, LeftOuterSemi, LeftOuterAnti, Cross variants,
NullAware_{Anti,LeftOuterSemi,LeftOuterAnti} (for NOT IN), RightSemi/
RightAnti — plus residual non-equi "other conditions"
(dbms/src/Interpreters/Join.h:177 JoinNonEqualConditions). NULL keys never
match (Join.h:148-152).

Spark-first mapping:
- Inner/LeftOuter/RightOuter/Full/Semi/Anti/Cross → native `how=` values.
- RightSemi/RightAnti → flip sides (build/probe choice is Catalyst's).
- LeftOuterSemi (semi + matched flag) → left join + groupBy max(flag),
  or an EXISTS-flag aggregation (kept as one shuffle).
- NullAware Anti (NOT IN) → Catalyst compiles `NOT IN (subquery)` to
  null-aware anti join natively; expressed via SQL expr here.
- Residual other-conditions → extra predicates in the join condition
  (Catalyst evaluates them inside the hash join, matching TiFlash).

Scale notes: only constant-size dims (region/nation — catalog.
BROADCAST_TABLES) are wrapped in broadcast(); sf-scaled tables
(customer/supplier/part) are left to AQE, which picks broadcast-vs-
shuffle from runtime sizes (a forced hint would bypass
autoBroadcastJoinThreshold and OOM at 100 TB). TiDB picks
broadcast-vs-shuffle via Exchange type; we pick via table class.
Fact-fact joins shuffle on the key; AQE handles
skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain with broadcast dims (TPC-H Q5 shape):
    revenue per nation for one region, one year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey))
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


JOIN_INNER_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftOuter with residual other-condition: customers and their count of
    big orders; customers with none keep a NULL-turned-0 count (Q13 shape).
    The `o_totalprice > 150000` residual rides inside the join, not a
    post-filter — outer rows survive (Join.h JoinNonEqualConditions)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 150000), "left"
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
        .groupBy("n_big_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.col("n_big_orders"))
    )


JOIN_LEFT_OUTER_SQL = """
SELECT n_big_orders, COUNT(*) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_totalprice > 150000
  GROUP BY c_custkey
) t
GROUP BY n_big_orders
ORDER BY n_big_orders
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightOuter (reference backfills unmatched build rows via
    ScanHashMapAfterProbeBlockInputStream.cpp). Orders right-joined to the
    subset of customers in segment BUILDING."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_nationkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("c_nationkey")
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT c_nationkey, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
FROM (SELECT * FROM orders WHERE o_totalprice > 250000) o
RIGHT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
  ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: customer nations vs supplier nations with per-side counts."""
    c = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): customers that placed at least one urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


JOIN_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_idle"))
        .orderBy("c_mktsegment")
    )


JOIN_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_idle
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti join — MySQL NOT IN semantics (reference
    NullAware_Anti kind; NULL on either side kills the row). Expressed as
    SQL NOT IN so Catalyst plans its native null-aware anti join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_naaj_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_naaj_orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM _naaj_customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM _naaj_orders WHERE o_totalprice > 50000
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


JOIN_NULL_AWARE_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_left_outer_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftOuterSemi: every left row kept + a matched flag (TiFlash uses this
    for `x IN (subquery)` in a select list). One aggregation, no row blowup:
    left join then max(flag) per left key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    flagged = (
        c.join(o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left")
        .select("c_custkey", "c_mktsegment", F.col("o_custkey").isNotNull().alias("has_urgent"))
    )
    return (
        flagged.groupBy("c_mktsegment", "has_urgent")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "has_urgent")
    )


JOIN_LEFT_OUTER_SEMI_SQL = """
SELECT c_mktsegment, has_urgent, COUNT(*) AS n
FROM (
  SELECT c_custkey, c_mktsegment,
         EXISTS (SELECT 1 FROM orders
                 WHERE o_custkey = c_custkey
                   AND o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer
) t
GROUP BY c_mktsegment, has_urgent
ORDER BY c_mktsegment, has_urgent
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta condition (reference Cross kinds run nested-loop
    with 'other conditions'; Spark = cross + filter, or BroadcastNestedLoop).
    Region × nation pairs where the nation is NOT in the region."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(F.broadcast(n))
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_foreign"))
        .orderBy("r_name")
    )


JOIN_CROSS_SQL = """
SELECT r_name, COUNT(*) AS n_foreign
FROM region CROSS JOIN nation
WHERE n_regionkey <> r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def join_self_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join against an aggregated subquery of the same table (TPC-H Q17
    shape): lineitems below 50% of their part's average quantity. The agg
    side shuffles once on l_partkey and joins co-partitioned."""
    l = load_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        l.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


JOIN_SELF_AGG_SQL = """
SELECT COUNT(*) AS n_small,
       ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN (SELECT l_partkey, AVG(l_quantity) * 0.5 AS half_avg
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.l_partkey
WHERE l_quantity < half_avg
"""


QUERIES = {
    "join_inner_broadcast": join_inner_broadcast,
    "join_left_outer": join_left_outer,
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_null_aware_anti": join_null_aware_anti,
    "join_left_outer_semi": join_left_outer_semi,
    "join_cross": join_cross,
    "join_self_agg": join_self_agg,
}

ORACLE = {
    "join_inner_broadcast": JOIN_INNER_SQL,
    "join_left_outer": JOIN_LEFT_OUTER_SQL,
    "join_right_outer": JOIN_RIGHT_OUTER_SQL,
    "join_full_outer": JOIN_FULL_OUTER_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_null_aware_anti": JOIN_NULL_AWARE_ANTI_SQL,
    "join_left_outer_semi": JOIN_LEFT_OUTER_SEMI_SQL,
    "join_cross": JOIN_CROSS_SQL,
    "join_self_agg": JOIN_SELF_AGG_SQL,
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left) side's key into
    `salt` sub-keys and explode the build side to match.

    AQE's skew-join split handles most cases automatically
    (spark.sql.adaptive.skewJoin, on in session.py); this is the explicit
    tool for the pathological hot-key case AQE can't split — a single key
    exceeding one executor's memory. Cost model: right side is replicated
    ×salt, so use it when |hot key rows| >> salt × |right|.

    Only inner/left shapes are supported: the right side is exploded
    ×salt, so an unmatched right row would surface `salt` duplicate
    copies under right/full joins.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the exploded right side would duplicate unmatched right rows "
            "under right/full outer joins"
        )
    salted_left = left.withColumn(
        "_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt).cast("int")
    ).withColumn("_salt", F.abs("_salt"))
    exploded_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_left.join(
        exploded_right,
        (salted_left[left_key] == exploded_right[right_key])
        & (salted_left["_salt"] == exploded_right["_salt"]),
        how,
    )
    return joined.drop("_salt")


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join demo on the natural skew of lineitem.l_suppkey → supplier:
    identical result to the plain join, skew-proof plan."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    joined = salted_join(l, s, "l_suppkey", "s_suppkey", salt=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("volume"),
        )
        .orderBy("s_nationkey")
    )


JOIN_SALTED_SKEW_SQL = """
SELECT s_nationkey,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice), 2) AS volume
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""

QUERIES["join_salted_skew"] = join_salted_skew
ORACLE["join_salted_skew"] = JOIN_SALTED_SKEW_SQL


def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightSemi (reference ASTTablesInSelectQuery.h RightSemi): semi join
    keeping the BUILD side — Spark expresses it by flipping probe/build;
    Catalyst picks the physical build side independently. Orders that have
    at least one high-discount line."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


JOIN_RIGHT_SEMI_SQL = """
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RightAnti: orders with NO high-discount lines."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


JOIN_RIGHT_ANTI_SQL = """
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def join_left_outer_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftOuterAnti: every left row + a NOT-matched flag (TiFlash lowers
    `x NOT IN (...)` in a select list to this kind). Dual of
    join_left_outer_semi — flag inverted, no row loss."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    flagged = c.join(
        o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left"
    ).select("c_custkey", "c_mktsegment", F.col("o_custkey").isNull().alias("no_urgent"))
    return (
        flagged.groupBy("c_mktsegment", "no_urgent")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "no_urgent")
    )


JOIN_LEFT_OUTER_ANTI_SQL = """
SELECT c_mktsegment, no_urgent, COUNT(*) AS n
FROM (
  SELECT c_custkey, c_mktsegment,
         NOT EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey
                       AND o_orderpriority = '1-URGENT') AS no_urgent
  FROM customer
) t
GROUP BY c_mktsegment, no_urgent
ORDER BY c_mktsegment, no_urgent
"""

QUERIES["join_right_semi"] = join_right_semi
QUERIES["join_right_anti"] = join_right_anti
QUERIES["join_left_outer_anti"] = join_left_outer_anti
ORACLE["join_right_semi"] = JOIN_RIGHT_SEMI_SQL
ORACLE["join_right_anti"] = JOIN_RIGHT_ANTI_SQL
ORACLE["join_left_outer_anti"] = JOIN_LEFT_OUTER_ANTI_SQL


def null_aware_in_flag(
    left: DataFrame, left_col: str, right: DataFrame, right_col: str, flag: str = "in_flag"
) -> DataFrame:
    """NullAware_LeftOuterSemi: `left_col IN (SELECT right_col ...)` as a
    select-list flag with SQL three-valued logic
    (reference ASTTablesInSelectQuery.h:94-121, NullAwareSemiJoinHelper.h):

      TRUE  — a non-NULL match exists
      NULL  — no match, but left_col IS NULL (vs non-empty subquery) or the
              subquery contains a NULL (can't prove non-membership)
      FALSE — otherwise (including: subquery empty)

    Scale plan: the NULL-ness of the subquery collapses to a broadcast
    1-row summary (has_null, non-empty) — the per-row work stays a plain
    hash join on the non-null keys, exactly the reference's NA-join
    "null row broadcast" special path, with no row blowup.
    """
    # internal column names must not collide with the caller's schema —
    # suffix with the first token that is free on BOTH sides
    i = 0
    while any(
        f"{base}{i}" in left.columns or f"{base}{i}" in right.columns
        for base in ("_k", "_n_sub", "_sub_has_null")
    ):
        i += 1
    k, n_sub, has_null = f"_k{i}", f"_n_sub{i}", f"_sub_has_null{i}"
    keys = right.select(F.col(right_col).alias(k))
    summary = F.broadcast(
        keys.agg(
            F.count(F.lit(1)).alias(n_sub),
            F.max(F.col(k).isNull().cast("int")).alias(has_null),
        )
    )
    matched = keys.filter(F.col(k).isNotNull()).distinct()
    out = (
        left.join(matched, left[left_col] == F.col(k), "left")
        .crossJoin(summary)
        .withColumn(
            flag,
            F.when(F.col(k).isNotNull(), F.lit(True))
            .when(F.col(n_sub) == 0, F.lit(False))
            .when(
                F.col(left_col).isNull() | (F.col(has_null) == 1),
                F.lit(None).cast("boolean"),
            )
            .otherwise(F.lit(False)),
        )
    )
    return out.drop(k, n_sub, has_null)


def null_aware_not_in_flag(
    left: DataFrame, left_col: str, right: DataFrame, right_col: str, flag: str = "not_in_flag"
) -> DataFrame:
    """NullAware_LeftOuterAnti: `left_col NOT IN (subquery)` flag — the
    3-valued negation of the IN flag (NULL stays NULL)."""
    i = 0
    while f"_in{i}" in left.columns:
        i += 1
    tmp = f"_in{i}"
    out = null_aware_in_flag(left, left_col, right, right_col, flag=tmp)
    return out.withColumn(flag, ~F.col(tmp)).drop(tmp)


def _na_flag_inputs(spark: SparkSession, sf_dir: str):
    """Deterministic nullable key pair for the NA flag queries: customer
    keys NULLed on %7, urgent-order custkeys NULLed on %11 — both sides
    reproducible in the DuckDB oracle."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("x"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.when(F.col("o_custkey") % 11 == 0, F.lit(None))
            .otherwise(F.col("o_custkey"))
            .alias("k")
        )
    )
    return c, o


def join_na_left_outer_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NullAware_LeftOuterSemi over a nullable key pair; grouped into
    TRUE/FALSE/NULL flag buckets per segment."""
    c, o = _na_flag_inputs(spark, sf_dir)
    return (
        null_aware_in_flag(c, "x", o, "k")
        .groupBy("c_mktsegment", "in_flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "in_flag")
    )


JOIN_NA_LEFT_OUTER_SEMI_SQL = """
SELECT c_mktsegment, in_flag, COUNT(*) AS n
FROM (
  SELECT c_mktsegment,
         (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END) IN (
            SELECT CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END
            FROM orders WHERE o_orderpriority = '1-URGENT') AS in_flag
  FROM customer
) t
GROUP BY c_mktsegment, in_flag
ORDER BY c_mktsegment, in_flag
"""


def join_na_left_outer_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NullAware_LeftOuterAnti (NOT IN flag) over the same nullable pair."""
    c, o = _na_flag_inputs(spark, sf_dir)
    return (
        null_aware_not_in_flag(c, "x", o, "k")
        .groupBy("c_mktsegment", "not_in_flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "not_in_flag")
    )


JOIN_NA_LEFT_OUTER_ANTI_SQL = """
SELECT c_mktsegment, not_in_flag, COUNT(*) AS n
FROM (
  SELECT c_mktsegment,
         (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END) NOT IN (
            SELECT CASE WHEN o_custkey % 11 = 0 THEN NULL ELSE o_custkey END
            FROM orders WHERE o_orderpriority = '1-URGENT') AS not_in_flag
  FROM customer
) t
GROUP BY c_mktsegment, not_in_flag
ORDER BY c_mktsegment, not_in_flag
"""

QUERIES["join_na_left_outer_semi"] = join_na_left_outer_semi
QUERIES["join_na_left_outer_anti"] = join_na_left_outer_anti
ORACLE["join_na_left_outer_semi"] = JOIN_NA_LEFT_OUTER_SEMI_SQL
ORACLE["join_na_left_outer_anti"] = JOIN_NA_LEFT_OUTER_ANTI_SQL

# --- Cross_* kinds: non-equi semi / anti / outer (nested-loop family) -------
#
# Reference join kinds Cross_Semi / Cross_Anti / Cross_LeftOuter /
# Cross_LeftOuterSemi (dbms/src/Parsers/ASTTablesInSelectQuery.h:94-121)
# run nested-loop probes with only "other conditions" (no equi keys).
# Spark plans these as BroadcastNestedLoopJoin — which is ALSO the only
# sane 100 TB shape: the build side must be broadcast-small because a
# non-equi condition can't hash-partition. All three queries keep the
# build side at dim-table size (region, 5 rows) on purpose.


def join_cross_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross_Semi: EXISTS with a pure non-equi condition — orders whose
    price clears at least one region-derived threshold. Plans as
    BroadcastNestedLoopJoin LeftSemi (build side broadcast, probe
    streams)."""
    o = load_table(spark, sf_dir, "orders")
    r = load_table(spark, sf_dir, "region")
    cond = F.col("o_totalprice") > (F.col("r_regionkey") + 1) * 100000.0
    return (
        o.join(F.broadcast(r), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_CROSS_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE EXISTS (SELECT 1 FROM region
              WHERE o_totalprice > (r_regionkey + 1) * 100000.0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def join_cross_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross_Anti: NOT EXISTS with a pure non-equi condition — orders
    below every region threshold. BroadcastNestedLoopJoin LeftAnti."""
    o = load_table(spark, sf_dir, "orders")
    r = load_table(spark, sf_dir, "region")
    cond = F.col("o_totalprice") > (F.col("r_regionkey") + 1) * 100000.0
    return (
        o.join(F.broadcast(r), cond, "left_anti")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_CROSS_ANTI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM region
                  WHERE o_totalprice > (r_regionkey + 1) * 100000.0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def join_cross_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross_LeftOuter + Cross_LeftOuterSemi in one shape: nations LEFT
    JOIN regions on a strict non-equi condition (region key above the
    nation's own); unmatched nations keep a NULL side. n_higher counts
    matches (LeftOuter semantics), has_higher is the match flag the
    Cross_LeftOuterSemi kind surfaces as a select-list column."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("r_regionkey") > F.col("n_regionkey"), "left")
        .groupBy("n_name")
        .agg(
            F.count("r_regionkey").cast("long").alias("n_higher"),
            (F.count("r_regionkey") > 0).alias("has_higher"),
        )
        .orderBy("n_name")
    )


JOIN_CROSS_LEFT_OUTER_SQL = """
SELECT n_name,
       CAST(COUNT(r_regionkey) AS BIGINT) AS n_higher,
       COUNT(r_regionkey) > 0 AS has_higher
FROM nation LEFT JOIN region ON r_regionkey > n_regionkey
GROUP BY n_name
ORDER BY n_name
"""

QUERIES["join_cross_semi"] = join_cross_semi
QUERIES["join_cross_anti"] = join_cross_anti
QUERIES["join_cross_left_outer"] = join_cross_left_outer
ORACLE["join_cross_semi"] = JOIN_CROSS_SEMI_SQL
ORACLE["join_cross_anti"] = JOIN_CROSS_ANTI_SQL
ORACLE["join_cross_left_outer"] = JOIN_CROSS_LEFT_OUTER_SQL

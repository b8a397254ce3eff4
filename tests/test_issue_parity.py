"""Regression pins mirrored from the reference's issue suite
(tests/fullstack-test/issues/) where the semantics map onto this engine."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.admin_sql import run_sql
from tiflash_spark.sources.delta_store import DeltaStore


def test_issue_10809_all_null_column_survives_compact(spark, tmp_path):
    """issue_10809_int_decimal.test: compacting a replica whose nullable
    scalar column is entirely NULL must keep every row; count(*) counts
    them, count(v) counts none — for int AND decimal columns."""
    for name, dtype in [("i", T.IntegerType()), ("d", T.DecimalType(20, 6))]:
        store = DeltaStore(spark, str(tmp_path / f"t_{name}"))
        schema = T.StructType(
            [T.StructField(HANDLE, T.LongType()), T.StructField("v", dtype)]
        )
        store.write_batch(
            spark.createDataFrame([(i, None) for i in range(1, 129)], schema),
            version=1,
        )
        store.as_view(f"t_10809_{name}")
        res = run_sql(
            spark, f"ALTER TABLE t_10809_{name} COMPACT TIFLASH REPLICA",
            {f"t_10809_{name}": store},
        ).collect()[0]
        assert res.rows_kept == 128
        [r] = run_sql(
            spark,
            f"SELECT COUNT(*) AS n_all, COUNT(v) AS n_v FROM t_10809_{name}",
        ).collect()
        assert (r.n_all, r.n_v) == (128, 0)


def test_issue_4519_decimal_join_keys_across_scales(spark):
    """issue_4519.test: joining decimal keys of different (precision,
    scale) compares NUMERICALLY (0.1000000000 = 0.10000000000000000000),
    and NULL keys never match."""
    rows = [
        (Decimal("0.1"), Decimal("0.1"), Decimal("1")),
        (Decimal("1.0"), Decimal("0.1"), Decimal("1")),
        (Decimal("0"), Decimal("0"), Decimal("0")),
        (None, None, None),
        (Decimal("99.9"), Decimal("0.99"), Decimal("99")),
    ]
    schema = T.StructType(
        [
            T.StructField("col1", T.DecimalType(30, 10)),
            T.StructField("col2", T.DecimalType(20, 20)),
            T.StructField("col3", T.DecimalType(30, 0)),
        ]
    )
    t = spark.createDataFrame(rows, schema)
    j12 = (
        t.alias("t1")
        .join(t.alias("t2"), F.col("t1.col1") == F.col("t2.col2"))
        .select("t1.col1", "t2.col2")
    )
    got = sorted(r.col1 for r in j12.collect())
    # NULLs never join; both 0.1-keyed left rows match the 0.1 right row
    assert got == [Decimal("0"), Decimal("0.1"), Decimal("0.1")]
    j13 = (
        t.alias("t1")
        .join(t.alias("t2"), F.col("t1.col1") == F.col("t2.col3"))
        .select("t1.col1", "t2.col3")
    )
    assert j13.count() == 3  # 1.0 x two 1-rows + 0 x 0


def test_issue_3373_having_not_in_empty_subquery(spark):
    """Port of issues/issue_3373.test: SUM over an empty table is NULL,
    and HAVING NULL NOT IN (empty correlated subquery) must KEEP the row
    (NOT IN over an empty set is TRUE, three-valued logic regardless of
    the NULL probe) — golden: one NULL row. (DuckDB cannot bind the
    HAVING alias inside the correlated subquery — Binder Error — so this
    pin carries the reference's own golden, not an oracle.)"""
    spark.createDataFrame([], "a int").createOrReplaceTempView("i3373_t")
    spark.createDataFrame([], "a double, b float").createOrReplaceTempView("i3373_t2")
    q = ("SELECT SUM(a) AS x FROM i3373_t "
         "HAVING x NOT IN (SELECT b FROM i3373_t2 WHERE x IN (b))")
    rows = spark.sql(q).collect()
    assert len(rows) == 1 and rows[0].x is None


def test_issue_1796_group_by_constant(spark):
    """Port of issues/issue_1796.test: aggregation GROUP BY a constant
    string collapses to one group — golden: the max timestamp."""
    import datetime as dt

    spark.createDataFrame(
        [(dt.datetime(2018, 11, 22, 16, 55, 24), 1),
         (dt.datetime(2018, 11, 23, 0, 55, 24), 1)],
        "a timestamp, b int",
    ).createOrReplaceTempView("i1796_t")
    rows = spark.sql("SELECT max(a) AS m FROM i1796_t GROUP BY 'a'").collect()
    assert len(rows) == 1
    assert rows[0].m == dt.datetime(2018, 11, 23, 0, 55, 24)


def test_issue_10809_varchar_null_and_empty_survive_compact(spark, tmp_path):
    """issue_10809_varchar.test, driven VERBATIM through the SQL
    surface: an all-NULL nullable varchar and an all-empty NOT NULL
    varchar both keep every row across compaction."""
    stores = {}
    run_sql(
        spark,
        "CREATE TABLE t10809v_null (id INT NOT NULL, v VARCHAR(32), "
        "PRIMARY KEY CLUSTERED (id))",
        stores, base_path=str(tmp_path),
    )
    run_sql(
        spark,
        "INSERT INTO t10809v_null SELECT id, CAST(NULL AS STRING) "
        "FROM (SELECT explode(sequence(1, 128)) AS id)",
        stores,
    )
    run_sql(spark, "ALTER TABLE t10809v_null COMPACT TIFLASH REPLICA", stores)
    [r] = run_sql(
        spark, "SELECT COUNT(*) AS n_all, COUNT(v) AS n_v FROM t10809v_null"
    ).collect()
    assert (r.n_all, r.n_v) == (128, 0)
    run_sql(
        spark,
        "CREATE TABLE t10809v_empty (id INT NOT NULL, v VARCHAR(32) NOT NULL, "
        "PRIMARY KEY CLUSTERED (id))",
        stores, base_path=str(tmp_path),
    )
    run_sql(
        spark,
        "INSERT INTO t10809v_empty SELECT id, '' FROM "
        "(SELECT explode(sequence(1, 128)) AS id)",
        stores,
    )
    run_sql(spark, "ALTER TABLE t10809v_empty COMPACT TIFLASH REPLICA", stores)
    [r] = run_sql(
        spark,
        "SELECT COUNT(*) AS n_all, SUM(LENGTH(v)) AS len_sum FROM t10809v_empty",
    ).collect()
    assert (r.n_all, r.len_sum) == (128, 0)


def test_issue_1962_nonequi_left_join_no_match_extends_null(spark, tmp_path):
    """issue_1962.test: a LEFT JOIN whose only condition is non-equi
    (t1.id > 10 * t2.id) and matches nothing must NULL-extend every left
    row (broadcast-cartesian residual path), not drop or duplicate."""
    stores = {}
    run_sql(
        spark,
        "CREATE TABLE t1962 (pk INT NOT NULL, id INT, value VARCHAR(64), "
        "PRIMARY KEY CLUSTERED (pk))",
        stores, base_path=str(tmp_path),
    )
    run_sql(spark, "INSERT INTO t1962 VALUES (0, 1, 'a'), (1, 2, 'b')", stores)
    rows = run_sql(
        spark,
        "SELECT t1.pk, t1.id, t1.value, t2.pk AS pk2, t2.id AS id2, "
        "t2.value AS value2 FROM t1962 t1 LEFT JOIN t1962 t2 "
        "ON t1.id > 10 * t2.id ORDER BY t1.pk",
    ).collect()
    assert [(r.pk, r.id, r.value, r.pk2, r.id2, r.value2) for r in rows] == [
        (0, 1, "a", None, None, None),
        (1, 2, "b", None, None, None),
    ]
    # issue_2471's companion: the same shape with an equi condition
    rows = run_sql(
        spark,
        "SELECT t1.pk, t2.pk AS pk2 FROM t1962 t1 LEFT JOIN t1962 t2 "
        "ON t1.id = t2.id ORDER BY t1.pk",
    ).collect()
    assert [(r.pk, r.pk2) for r in rows] == [(0, 0), (1, 1)]


def test_issue_3447_string_truthiness_soft_parse(spark):
    """issue_3447.test: `WHERE a` on a char column uses MySQL's soft
    string->number parse — '0.1'/-0.1/-1 truthy; '0.0', 'a0.1' (no
    numeric prefix), '0x01' (hex NOT parsed in string context) falsy."""
    from tiflash_spark.functions.mysql_compat import mysql_str_to_number

    df = spark.createDataFrame(
        [("0.1",), ("-0.1",), ("0.0",), ("-1",), ("a0.1",), ("0x01",)], "a string"
    )
    got = [
        r.a
        for r in df.filter(F.coalesce(mysql_str_to_number(F.col("a")), F.lit(0.0)) != 0)
        .collect()
    ]
    assert got == ["0.1", "-0.1", "-1"]


def test_issue_3333_round_with_column_scale(spark):
    """issue_3333.test: ROUND(a, b) where the scale is a COLUMN — every
    int width (signed and unsigned-widened) returns 1.22 for
    (a=1.22 float, b=2)."""
    from tiflash_spark.functions.misc import mysql_round
    from tiflash_spark.functions.sql_registry import register_mysql_functions

    for btype in ["bigint", "decimal(20,0)", "int",
                  "smallint", "tinyint"]:
        df = spark.createDataFrame([(1.22, 2)], "a float, b int").select(
            "a", F.col("b").cast(btype).alias("b")
        )
        [r] = df.select(mysql_round("a", F.col("b")).alias("r")).collect()
        assert abs(r.r - 1.22) < 1e-9, btype
    register_mysql_functions(spark)
    spark.createDataFrame([(1.22, 2)], "a float, b int").createOrReplaceTempView(
        "t3333"
    )
    [r] = spark.sql("SELECT mysql_round(a, b) AS r FROM t3333").collect()
    assert abs(r.r - 1.22) < 1e-9
    # negative scale + half-away-from-zero pins
    [r] = spark.sql(
        "SELECT mysql_round(-2.5, 0) AS a, mysql_round(1250.0, -2) AS b, "
        "mysql_round(999999.9999999999, -1) AS c"
    ).collect()
    assert (r.a, r.b, r.c) == (-3.0, 1300.0, 1000000.0)


def test_issue_6807_general_ci_correlated_in_subquery(spark):
    """issue_6807.test: utf8mb4_general_ci comparisons inside a
    correlated IN subquery — max(a) FROM t1 WHERE a IN (SELECT b FROM t2
    WHERE a > b), all comparisons case-insensitive; expected 'YmkS'."""
    from tiflash_spark.functions.collation import GENERAL_CI, collation_key

    t1 = spark.createDataFrame(
        [("jlsf", 1), (None, 2), ("YmkS", 3), ("0", 4)], "a string, id int"
    )
    t2 = spark.createDataFrame(
        [("yMKs", "jlsf", 1), ("yyds", "YmkS", 2), ("cc", "4", 3),
         (None, None, 4), ("abc", None, 5), (None, "df", 6)],
        "a string, b string, id int",
    )
    in_list = t2.filter(
        collation_key(F.col("a"), GENERAL_CI) > collation_key(F.col("b"), GENERAL_CI)
    ).select(collation_key(F.col("b"), GENERAL_CI).alias("bk"))
    got = (
        t1.join(in_list, collation_key(F.col("a"), GENERAL_CI) == F.col("bk"),
                "left_semi")
        .agg(F.max_by("a", collation_key(F.col("a"), GENERAL_CI)).alias("m"))
        .collect()[0]
        .m
    )
    assert got == "YmkS"

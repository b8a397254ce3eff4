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

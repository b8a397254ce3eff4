"""Aggregation-executor edge cases ported from the reference's mock-plan
gtest suite (dbms/src/Flash/tests/gtest_aggregation_executor.cpp) — the
NULL-literal / NULL-column / NULL-group-key / empty-input matrix (round-9
verdict ask #8). Engine-internal cases (two-level merge thresholds, block
splitting, fine-grained shuffle) are Spark's own machinery and are not
re-tested; what's ported is result semantics through the SQL surface.

gtest case → pytest mapping:

  AggregationCount (count(col-with-NULLs) / count(1) / count(NULL)
      literal, grouped and ungrouped)  → test_count_matrix
  AggregationMaxAndMin (max/min by one and two keys, all-NULL group)
      → test_max_min_groups
  GroupBy (NULL group key forms its own group) → test_null_group_key
  AggNull (max over all-NULL + group-by over NULL column)
      → test_agg_over_nullable_column
  Empty (grouped agg over empty input → 0 rows; ungrouped count(1) → 0;
      ungrouped max → NULL) → test_empty_input
  RepeatedAggregateFunction (same aggregate repeated in one statement)
      → test_repeated_aggregates
"""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

import pytest

from tiflash_spark.sources.admin_sql import run_sql

# the gtest's clerk fixture, verbatim (None = NULL)
AGE = [30, None, 27, 32, 25, 36, None, 22, 34]
GENDER = ["male", "female", "female", "male", "female", "female", "male",
          "female", "male"]
COUNTRY = ["russia", "korea", "usa", "usa", "usa", "china", "china",
           "china", "china"]
SALARY = [1000.1, 1300.2, 0.3, None, -200.4, 900.5, -999.6, 2000.7, -300.8]
PR = [1, 2, 0, 3290124, 968933, 3125, 31236, 4327, 80000]


@pytest.fixture(scope="module")
def clerk(spark, tmp_path_factory):
    stores: dict = {}
    base = str(tmp_path_factory.mktemp("clerk"))
    run_sql(
        spark,
        "create table clerk (age int, gender varchar(10),"
        " country varchar(10), salary double, pr bigint)",
        stores, base,
    )
    vals = ", ".join(
        "({}, '{}', '{}', {}, {})".format(
            "NULL" if a is None else a, g, c,
            "NULL" if s is None else s, p,
        )
        for a, g, c, s, p in zip(AGE, GENDER, COUNTRY, SALARY, PR)
    )
    run_sql(spark, f"insert into clerk values {vals}", stores, base)
    return stores, base


def test_count_matrix(spark, clerk):
    stores, base = clerk
    by_country = {
        r[0]: r[1] for r in run_sql(
            spark,
            "select country, count(age) as n from clerk group by country",
            stores, base).collect()
    }
    # gtest: {china: 3, usa: 3, russia: 1, korea: 0}
    assert by_country == {"china": 3, "usa": 3, "russia": 1, "korea": 0}
    two_key = sorted(
        r.n for r in run_sql(
            spark,
            "select country, gender, count(gender) as n from clerk"
            " group by country, gender",
            stores, base).collect()
    )
    assert two_key == [1, 1, 1, 2, 2, 2]
    assert run_sql(spark, "select count(1) from clerk",
                   stores, base).collect()[0][0] == 9
    assert run_sql(spark, "select count(NULL) from clerk",
                   stores, base).collect()[0][0] == 0
    per_g = [r[1] for r in run_sql(
        spark,
        "select country, count(NULL) as n from clerk group by country",
        stores, base).collect()]
    assert per_g == [0, 0, 0, 0]
    pr_counts = sorted(r[1] for r in run_sql(
        spark,
        "select country, count(pr) as n from clerk group by country",
        stores, base).collect())
    assert pr_counts == [1, 1, 3, 4]


def test_max_min_groups(spark, clerk):
    stores, base = clerk
    mx = {r[0]: r[1] for r in run_sql(
        spark, "select country, max(age) as m from clerk group by country",
        stores, base).collect()}
    assert mx == {"china": 36, "usa": 32, "russia": 30, "korea": None}
    mn = {r[0]: r[1] for r in run_sql(
        spark, "select country, min(age) as m from clerk group by country",
        stores, base).collect()}
    assert mn == {"china": 22, "usa": 25, "russia": 30, "korea": None}
    mx2 = {(r[0], r[1]): r[2] for r in run_sql(
        spark,
        "select country, gender, max(salary) as m from clerk"
        " group by country, gender",
        stores, base).collect()}
    assert mx2 == {
        ("china", "female"): 2000.7, ("korea", "female"): 1300.2,
        ("russia", "male"): 1000.1, ("usa", "female"): 0.3,
        ("china", "male"): -300.8, ("usa", "male"): None,
    }
    mn2 = {(r[0], r[1]): r[2] for r in run_sql(
        spark,
        "select country, gender, min(salary) as m from clerk"
        " group by country, gender",
        stores, base).collect()}
    assert mn2 == {
        ("korea", "female"): 1300.2, ("russia", "male"): 1000.1,
        ("china", "female"): 900.5, ("usa", "female"): -200.4,
        ("china", "male"): -999.6, ("usa", "male"): None,
    }


def test_null_group_key(spark, clerk):
    """gtest GroupBy: a NULL group key is ONE group of its own (both NULL
    ages land together)."""
    stores, base = clerk
    rows = run_sql(
        spark,
        "select age, count(1) as n from clerk group by age",
        stores, base,
    ).collect()
    by_key = {r[0]: r[1] for r in rows}
    assert by_key[None] == 2
    assert len(by_key) == 8  # 7 distinct ages + the NULL group


def test_agg_over_nullable_column(spark, tmp_path):
    """gtest AggNull: max over a column that is NULL in some rows; group
    by the same column keeps the NULL group."""
    stores: dict = {}
    base = str(tmp_path)
    run_sql(spark, "create table t1 (s1 varchar(20))", stores, base)
    run_sql(spark, "insert into t1 values ('banana'), (NULL), ('banana')",
            stores, base)
    assert run_sql(spark, "select max(s1) from t1",
                   stores, base).collect()[0][0] == "banana"
    groups = {r[0] for r in run_sql(
        spark, "select s1 from t1 group by s1", stores, base).collect()}
    assert groups == {None, "banana"}


def test_empty_input(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    run_sql(spark, "create table et (s1 bigint, s2 bigint)", stores, base)
    # grouped aggregate over empty input: ZERO rows
    assert run_sql(
        spark, "select s2, max(s1) as m from et group by s2",
        stores, base).collect() == []
    # ungrouped count over empty input: one row, 0
    assert run_sql(spark, "select count(1) from et",
                   stores, base).collect()[0][0] == 0
    # ungrouped max over empty input: one row, NULL
    assert run_sql(spark, "select max(s1) from et",
                   stores, base).collect()[0][0] is None


def test_repeated_aggregates(spark, tmp_path):
    """gtest RepeatedAggregateFunction: the same aggregate repeated (up to
    three deep in the gtest's cube) keeps per-site results."""
    stores: dict = {}
    base = str(tmp_path)
    run_sql(spark, "create table tt (s1 bigint, s2 bigint)", stores, base)
    run_sql(spark, "insert into tt values (1, 1), (2, 2), (3, 3)",
            stores, base)
    r = run_sql(
        spark,
        "select max(s1) as a, min(s1) as b, sum(s2) as c, max(s1) as d,"
        " sum(s2) as e, min(s1) as f from tt",
        stores, base,
    ).collect()[0]
    assert (r.a, r.b, int(r.c), r.d, int(r.e), r.f) == (3, 1, 6, 3, 6, 1)

"""Executor-level join edge cases ported from the reference's mock-plan
gtest suite (dbms/src/Flash/tests/gtest_join_executor.cpp) — the NULL-key
× other-condition × empty-build-side matrices richer than any `.test`
script (round-9 verdict ask #8). Data and expected flag columns are
verbatim from the gtest fixtures; queries go through the SQL surface
(run_sql), so the engine paths exercised are the projected-IN /
quantified-compare rewrites and Spark's own join executors.

gtest case → pytest mapping:

  SemiJoin t1 (key only, 5 datasets × 4 kinds)
      → test_semi_family_key_only
  SemiJoin t2 (other condition t.c < s.c, 4 datasets × 4 kinds,
      incl. NULL-c rows where the condition is UNKNOWN → flag 0)
      → test_semi_family_other_condition
  NullAwareSemiJoin t1 (key only, 6 datasets × 4 kinds, NULL keys both
      sides, empty build side beats NULL-key UNKNOWN)
      → test_null_aware_family_key_only
  NullAwareSemiJoin t2 (other condition, 6 datasets; UNKNOWN AND FALSE
      = FALSE collapses, UNKNOWN AND TRUE stays UNKNOWN)
      → test_null_aware_family_other_condition
  JoinWithNullTable (empty build side × inner/left-outer/semi/anti/
      left-outer-semi kinds with a never-true condition, + the
      column-pruned COUNT(1) variants)
      → test_join_with_empty_table
  LeftJoinAggWithOtherCondition (failed other condition still emits
      each left row once through outer backfill)
      → test_left_join_agg_other_condition
"""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

import pytest

from tiflash_spark.sources.admin_sql import run_sql


def _mk(spark, stores, base, name, cols, rows):
    """CREATE + INSERT a tiny table through the SQL surface; cols is
    'a bigint, c bigint'-style DDL, rows a list of tuples (None = NULL)."""
    run_sql(spark, f"create table {name} ({cols})", stores, base)
    if rows:
        vals = ", ".join(
            "(" + ", ".join("NULL" if v is None else repr(v) for v in r) + ")"
            for r in rows
        )
        run_sql(spark, f"insert into {name} values {vals}", stores, base)


def _flags(spark, stores, base, sql):
    rows = run_sql(spark, sql, stores, base).collect()
    return [
        (None if r.f is None else int(r.f))
        for r in sorted(rows, key=lambda r: r.i)
    ]


# --- SemiJoin t1: one key, no other condition ------------------------------
SEMI_T1 = [
    # (left a, right a, expected LeftOuterSemi flag per left row)
    ([1, 2, 3, 4, 5], [1, 2, 3, 4, 5], [1, 1, 1, 1, 1]),
    ([1, 2, 3, 4, 5], [6, 7, 8, 9, 10], [0, 0, 0, 0, 0]),
    ([1, 2, 3, 4, 5], [], [0, 0, 0, 0, 0]),
    ([1, 2, 3, 4, 5], [1, 2, 3], [1, 1, 1, 0, 0]),
    ([1, 2, 3, 4, 5], [1, 1, 2, 2, 5, 5], [1, 1, 0, 0, 1]),
]


@pytest.mark.parametrize("case", range(len(SEMI_T1)))
def test_semi_family_key_only(spark, tmp_path, case):
    left, right, want = SEMI_T1[case]
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "t", "i bigint, a bigint",
        [(i, a) for i, a in enumerate(left)])
    _mk(spark, stores, base, "s", "a bigint", [(a,) for a in right])
    # LeftOuterSemi: EXISTS flag (never NULL for non-null keys)
    got = _flags(
        spark, stores, base,
        "select i, exists(select 1 from s where s.a = t.a) as f from t",
    )
    assert got == want, f"dataset {case}"
    # Semi / AntiSemi: the filtered row sets
    semi = {r.i for r in run_sql(
        spark, "select i from t where a in (select a from s)",
        stores, base).collect()}
    anti = {r.i for r in run_sql(
        spark,
        "select i from t where not exists"
        " (select 1 from s where s.a = t.a)",
        stores, base).collect()}
    assert semi == {i for i, w in enumerate(want) if w == 1}
    assert anti == {i for i, w in enumerate(want) if w == 0}


# --- SemiJoin t2: one key + other condition t.c < s.c ----------------------
SEMI_T2 = [
    # (left (a,c), right (a,c), expected flags)
    ([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)],
     [(1, 2), (2, 2), (3, 2), (4, 2), (5, 2)], [1, 1, 1, 1, 1]),
    ([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)],
     [(6, 2), (7, 2), (8, 2), (9, 2), (10, 2)], [0, 0, 0, 0, 0]),
    ([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)], [], [0, 0, 0, 0, 0]),
    # NULL c on either side: UNKNOWN condition behaves as no-match
    # (EXISTS is two-valued) — gtest expects flags 0, never NULL
    ([(1, 1), (1, None), (2, 2), (2, None)],
     [(1, None), (1, 1), (1, 2), (2, 2), (2, None), (2, 3)],
     [1, 0, 1, 0]),
]


@pytest.mark.parametrize("case", range(len(SEMI_T2)))
def test_semi_family_other_condition(spark, tmp_path, case):
    left, right, want = SEMI_T2[case]
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "t", "i bigint, a bigint, c bigint",
        [(i, a, c) for i, (a, c) in enumerate(left)])
    _mk(spark, stores, base, "s", "a bigint, c bigint", right)
    got = _flags(
        spark, stores, base,
        "select i, exists(select 1 from s where s.a = t.a and t.c < s.c)"
        " as f from t",
    )
    assert got == want, f"dataset {case}"


# --- NullAwareSemiJoin t1: one key, no other condition ---------------------
NA_T1 = [
    # (left a, right a, expected null-aware IN flag: 1/0/None)
    ([1, 2, 3, 4, 5], [], [0, 0, 0, 0, 0]),
    ([1, None, None, 4, 5], [], [0, 0, 0, 0, 0]),  # empty beats NULL key
    ([1, 2, 3, 4, 5], [1, 2, 3, 4, 5], [1, 1, 1, 1, 1]),
    ([1, 2, 3, 4, 5], [6, 7, 8, 9, 10], [0, 0, 0, 0, 0]),
    ([1, 2, None, 4, 5], [1, 2, 8, 9, 10], [1, 1, None, 0, 0]),
    ([1, 2, 3, None, 5], [1, None, 3, 4, None], [1, None, 1, None, None]),
]


@pytest.mark.parametrize("case", range(len(NA_T1)))
def test_null_aware_family_key_only(spark, tmp_path, case):
    left, right, want = NA_T1[case]
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "t", "i bigint, a bigint",
        [(i, a) for i, a in enumerate(left)])
    _mk(spark, stores, base, "s", "a bigint", [(a,) for a in right])
    # NullAware_LeftOuterSemi: IN flag with 3VL
    got = _flags(
        spark, stores, base,
        "select i, (a in (select a from s)) as f from t",
    )
    assert got == want, f"dataset {case}"
    # NullAware_AntiLeftOuterSemi: NOT IN = 3VL negation
    got_not = _flags(
        spark, stores, base,
        "select i, (a not in (select a from s)) as f from t",
    )
    assert got_not == [None if w is None else 1 - w for w in want]
    # NullAware_Anti: NOT IN filter — UNKNOWN rows drop
    anti = {r.i for r in run_sql(
        spark, "select i from t where a not in (select a from s)",
        stores, base).collect()}
    assert anti == {i for i, w in enumerate(want) if w == 0}


# --- NullAwareSemiJoin t2: one key + other condition t.c < s.c -------------
# correlated IN: t.a IN (SELECT s.a FROM s WHERE t.c < s.c) — UNKNOWN key
# AND FALSE condition collapses to FALSE; UNKNOWN AND TRUE stays UNKNOWN
NA_T2 = [
    ([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)],
     [(1, 2), (2, 2), (3, 2), (4, 2), (5, 2)], [1, 1, 1, 1, 1]),
    ([(1, 2), (2, None), (None, 2), (None, 2), (5, 2)], [],
     [0, 0, 0, 0, 0]),
    ([(1, 2), (2, 2), (None, 2), (None, 2), (5, 2)],
     [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)], [0, 0, 0, 0, 0]),
    ([(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)],
     [(6, 2), (7, 2), (8, 2), (9, 2), (10, 2)], [0, 0, 0, 0, 0]),
    ([(1, 1), (2, 1), (None, 1), (4, 1), (5, 1)],
     [(1, 2), (2, 2), (8, 2), (9, 2), (10, 2)], [1, 1, None, 0, 0]),
    ([(1, 1), (2, 1), (3, 1), (None, 1), (5, 1)],
     [(1, 2), (None, 2), (3, 2), (4, 2), (None, 2)],
     [1, None, 1, None, None]),
]


@pytest.mark.parametrize("case", range(len(NA_T2)))
def test_null_aware_family_other_condition(spark, tmp_path, case):
    left, right, want = NA_T2[case]
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "t", "i bigint, a bigint, c bigint",
        [(i, a, c) for i, (a, c) in enumerate(left)])
    _mk(spark, stores, base, "s", "a bigint, c bigint", right)
    got = _flags(
        spark, stores, base,
        "select i, (a in (select a from s where t.c < s.c)) as f from t",
    )
    assert got == want, f"dataset {case}"


# --- JoinWithNullTable: empty build side -----------------------------------
def test_join_with_empty_table(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "t", "a bigint, b bigint, c bigint",
        [(a, b, c) for a, b, c in zip(
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 0],
            [1, 1, 1, 1, 1, 1, 1, 2, 2, 2],
            [1, 1, 1, 1, 1, 2, 2, 2, 2, 2])])
    _mk(spark, stores, base, "nt", "a bigint, b bigint, c bigint", [])

    def count1(sql):
        return run_sql(spark, sql, stores, base).collect()[0][0]

    # inner join, both directions and self
    assert count1("select count(1) from nt join t on nt.a = t.a") == 0
    assert count1("select count(1) from t join nt on t.a = nt.a") == 0
    assert count1("select count(1) from nt x join nt y on x.a = y.a") == 0
    # cross-shaped joins with the never-true-on-empty condition a > 5
    assert count1(
        "select count(1) from t join nt on t.a > 5 and nt.a is not null"
    ) == 0
    # left outer vs empty: every left row backfills once
    assert count1(
        "select count(1) from t left join nt on t.a > 5"
    ) == 10
    rows = run_sql(
        spark,
        "select t.a, nt.b as nb from t left join nt on t.a > 5",
        stores, base,
    ).collect()
    assert len(rows) == 10 and all(r.nb is None for r in rows)
    # right outer vs empty right: zero rows
    assert count1(
        "select count(1) from t right join nt on nt.a > 5"
    ) == 0
    # semi / anti
    assert count1(
        "select count(1) from t where exists"
        " (select 1 from nt where t.a > 5)"
    ) == 0
    assert count1(
        "select count(1) from t where not exists"
        " (select 1 from nt where t.a > 5)"
    ) == 10
    # left-outer-semi flag: all 0; anti variant: all 1
    fl = run_sql(
        spark,
        "select exists(select 1 from nt where t.a > 5) as f from t",
        stores, base,
    ).collect()
    assert [int(r.f) for r in fl] == [0] * 10
    fl2 = run_sql(
        spark,
        "select (not exists(select 1 from nt where t.a > 5)) as f from t",
        stores, base,
    ).collect()
    assert [int(r.f) for r in fl2] == [1] * 10


# --- LeftJoinAggWithOtherCondition -----------------------------------------
def test_left_join_agg_other_condition(spark, tmp_path):
    """A left join whose other-condition never holds still emits every
    left row exactly once (outer backfill), so COUNT(1) = left row count
    — not 0, not left×right."""
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "l", "s varchar(20), join_c varchar(20)",
        [("banana", "apple"), ("banana", "banana")])
    _mk(spark, stores, base, "r", "s varchar(20), join_c varchar(20)",
        [("banana", "apple"), ("banana", "banana")])
    n = run_sql(
        spark,
        "select count(1) from l left join r on l.join_c = r.join_c"
        " and l.s < r.s",
        stores, base,
    ).collect()[0][0]
    assert n == 2


def test_join_cast_cross_type_keys(spark, tmp_path):
    """gtest JoinCast: join keys of different physical types coerce to
    the least common type and match on VALUE — int=float, int=double,
    float=double, char=varchar=blobs, decimals of different scales, and
    datetime=timestamp (1-row inner joins; count(1) = 1 in each)."""
    stores: dict = {}
    base = str(tmp_path)

    def one(ddl1, v1, ddl2, v2):
        run_sql(spark, "drop table if exists c1", stores, base)
        run_sql(spark, "drop table if exists c2", stores, base)
        run_sql(spark, f"create table c1 (a {ddl1})", stores, base)
        run_sql(spark, f"create table c2 (a {ddl2})", stores, base)
        run_sql(spark, f"insert into c1 values ({v1})", stores, base)
        run_sql(spark, f"insert into c2 values ({v2})", stores, base)
        return run_sql(
            spark,
            "select count(1) from c1 join c2 on c1.a = c2.a",
            stores, base,
        ).collect()[0][0]

    assert one("int", "1", "float", "1.0") == 1
    assert one("int", "1", "double", "1.0") == 1
    assert one("float", "1", "double", "1") == 1
    assert one("char(5)", "'x'", "varchar(5)", "'x'") == 1
    assert one("text", "'x'", "varchar(5)", "'x'") == 1
    # decimal keys at different scales match on value, not rendering
    assert one("decimal(9,4)", "0.12", "decimal(9,3)", "0.12") == 1
    assert one("decimal(9,4)", "0.123", "decimal(9,3)", "0.123") == 1
    assert one("datetime", "'1970-01-01 00:00:01'",
               "timestamp", "'1970-01-01 00:00:01'") == 1

"""Window-executor edge cases ported from the reference's mock-plan gtest
suite (dbms/src/Flash/tests/gtest_window_executor.cpp) — NULL partition /
NULL order-key placement, rank-vs-dense_rank tie groups, stacked window
functions, and window functions over expression arguments (round-9
verdict ask #8, continuing test_gtest_join_parity / _agg_parity).

gtest case → pytest mapping:

  testWindowFunctionByPartitionAndOrder (row_number across int/string/
      float/datetime inputs; NULL partition is its OWN partition sorted
      first; NULL order key sorts first within its partition; empty
      input → empty output; 2+2 partition/order keys)
      → test_row_number_null_placement, test_row_number_two_keys,
        test_row_number_empty_input
  rank/dense_rank sections (ties share rank; rank skips, dense_rank
      doesn't; NULL-order rows form the first tie group; NULL partition
      ranks independently) → test_rank_dense_rank_ties
  multiWindow (dense_rank+rank stacked in one statement, any repetition
      and split) → test_stacked_window_functions
  functionAsArgument (LEAD/LAG over concat expressions, offsets 1/2,
      partition-edge NULL fill) → test_lead_lag_expression_arguments
"""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

from tiflash_spark.sources.admin_sql import run_sql


def _mk(spark, stores, base, name, cols, rows):
    run_sql(spark, f"create table {name} ({cols})", stores, base)
    if rows:
        vals = ", ".join(
            "(" + ", ".join(
                "NULL" if v is None else
                (f"'{v}'" if isinstance(v, str) else repr(v))
                for v in r
            ) + ")"
            for r in rows
        )
        run_sql(spark, f"insert into {name} values {vals}", stores, base)


def test_row_number_null_placement(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "w1", "p bigint, o bigint",
        [(None, None), (1, 1), (1, 1), (1, 2), (1, 2),
         (2, 1), (2, 1), (2, 2), (2, 2)])
    rows = run_sql(
        spark,
        "select p, o, row_number() over (partition by p order by o) as rn"
        " from w1 order by p, o, rn",
        stores, base,
    ).collect()
    got = [(r.p, r.o, r.rn) for r in rows]
    # gtest: NULL partition first with rn restarting at 1; each partition
    # numbers 1..4
    assert got == [
        (None, None, 1),
        (1, 1, 1), (1, 1, 2), (1, 2, 3), (1, 2, 4),
        (2, 1, 1), (2, 1, 2), (2, 2, 3), (2, 2, 4),
    ]


def test_row_number_empty_input(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "we", "p bigint, o bigint", [])
    assert run_sql(
        spark,
        "select p, o, row_number() over (partition by p order by o) as rn"
        " from we",
        stores, base,
    ).collect() == []


def test_row_number_two_keys(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    rows = []
    for p1 in (1, 2):
        for p2 in (1, 2):
            rows += [(p1, p2, 1, 1), (p1, p2, 1, 2), (p1, p2, 2, 2)]
    _mk(spark, stores, base, "w2",
        "p1 bigint, p2 bigint, o1 bigint, o2 bigint", rows)
    out = run_sql(
        spark,
        "select p1, p2, o1, o2, row_number() over"
        " (partition by p1, p2 order by o1, o2) as rn from w2"
        " order by p1, p2, o1, o2",
        stores, base,
    ).collect()
    assert [r.rn for r in out] == [1, 2, 3] * 4


def test_rank_dense_rank_ties(spark, tmp_path):
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "wr", "p bigint, o bigint",
        [(None, None), (None, 1), (1, 1), (1, 1), (1, 2), (1, 2),
         (2, 1), (2, 1), (2, 2), (2, 2)])
    rows = run_sql(
        spark,
        "select p, o,"
        " rank() over (partition by p order by o) as rk,"
        " dense_rank() over (partition by p order by o) as dr"
        " from wr order by p, o",
        stores, base,
    ).collect()
    got = [(r.p, r.o, r.rk, r.dr) for r in rows]
    # gtest: NULL partition: NULL order ranks 1, then 2; partition 1/2:
    # ties {1,1} then {3,3} for rank, {1,1}/{2,2} for dense_rank
    assert got == [
        (None, None, 1, 1), (None, 1, 2, 2),
        (1, 1, 1, 1), (1, 1, 1, 1), (1, 2, 3, 2), (1, 2, 3, 2),
        (2, 1, 1, 1), (2, 1, 1, 1), (2, 2, 3, 2), (2, 2, 3, 2),
    ]


def test_stacked_window_functions(spark, tmp_path):
    """gtest multiWindow: dense_rank and rank repeated (the gtest cubes
    up to three deep) over the same window in one statement — per-site
    results independent of repetition or ordering."""
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "wm", "p bigint, o bigint",
        [(1, 1), (1, 1), (1, 2), (1, 2), (2, 1), (2, 1), (2, 2), (2, 2)])
    rows = run_sql(
        spark,
        "select p, o,"
        " dense_rank() over (partition by p order by o) as d1,"
        " rank() over (partition by p order by o) as r1,"
        " dense_rank() over (partition by p order by o) as d2,"
        " rank() over (partition by p order by o) as r2"
        " from wm order by p, o",
        stores, base,
    ).collect()
    assert [r.d1 for r in rows] == [1, 1, 2, 2, 1, 1, 2, 2]
    assert [r.r1 for r in rows] == [1, 1, 3, 3, 1, 1, 3, 3]
    assert [(r.d1, r.r1) for r in rows] == [(r.d2, r.r2) for r in rows]


def test_lead_lag_expression_arguments(spark, tmp_path):
    """gtest functionAsArgument: LEAD/LAG over concat expressions with
    offsets, NULL at partition edges."""
    stores: dict = {}
    base = str(tmp_path)
    _mk(spark, stores, base, "wl", "p bigint, o bigint, v varchar(10)",
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
         (2, 5, "e"), (2, 6, "f"), (2, 7, "g"), (2, 8, "h")])
    rows = run_sql(
        spark,
        "select p, o,"
        " lead(concat(v, v), 1) over (partition by p order by o) as l1,"
        " lag(concat(v, '0'), 2) over (partition by p order by o) as l2,"
        " lead(concat(v, concat('0', v)), 1) over"
        " (partition by p order by o) as l3"
        " from wl order by p, o",
        stores, base,
    ).collect()
    assert [r.l1 for r in rows] == ["bb", "cc", "dd", None,
                                    "ff", "gg", "hh", None]
    assert [r.l2 for r in rows] == [None, None, "a0", "b0",
                                    None, None, "e0", "f0"]
    assert [r.l3 for r in rows] == ["b0b", "c0c", "d0d", None,
                                    "f0f", "g0g", "h0h", None]

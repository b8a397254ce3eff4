"""Adversarial join-kind matrix on FIXTURES.md group C tables — NULL keys,
duplicate keys, a skewed hot key — every kind cross-checked against DuckDB
on the identical data (ports the shape of gtest_join_executor.cpp:
result-set equality per join kind, SURVEY.md §5)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tiflash_spark.testing import normalize_rows

# join_small: ~40 rows with NULLs and dups; join_build: ~14 rows,
# 3 NULL keys, one key duplicated x5 (the hot key)
SMALL = pd.DataFrame(
    {
        "k": [None, None] + [i % 7 for i in range(30)] + [3] * 8,
        "k2": [None, "x"] + [f"s{i % 5}" for i in range(30)] + ["hot"] * 8,
        "v": list(range(40)),
    }
)
BUILD = pd.DataFrame(
    {
        "k": [None, None, None, 0, 1, 2, 3, 3, 3, 3, 3, 5, 8, 9],
        "k2": ["a", None, "b", "s0", "s1", "s2", "hot", "h2", "h3", "h4", "h5", "s4", "s8", "s9"],
        "w": list(range(100, 114)),
    }
)


@pytest.fixture(scope="module")
def tables(spark):
    sdf_small = spark.createDataFrame(SMALL.astype(object).where(pd.notnull(SMALL), None))
    sdf_build = spark.createDataFrame(BUILD.astype(object).where(pd.notnull(BUILD), None))
    con = duckdb.connect()
    con.register("js", SMALL)
    con.register("jb", BUILD)
    return sdf_small, sdf_build, con


def check(spark_df, con, sql, name):
    sp = normalize_rows(spark_df.toPandas())
    du = normalize_rows(con.execute(sql).fetchdf())
    assert sp == du, f"{name}: spark={sp[:5]} duckdb={du[:5]}"


KINDS = [
    # (name, how, duckdb sql)
    (
        "inner",
        "inner",
        "SELECT js.k AS k, v, w FROM js JOIN jb ON js.k = jb.k",
    ),
    (
        "left",
        "left",
        "SELECT js.k AS k, v, w FROM js LEFT JOIN jb ON js.k = jb.k",
    ),
    (
        "right",
        "right",
        "SELECT jb.k AS k, v, w FROM js RIGHT JOIN jb ON js.k = jb.k",
    ),
    (
        "full",
        "full",
        "SELECT COALESCE(js.k, jb.k) AS k, v, w FROM js FULL JOIN jb ON js.k = jb.k",
    ),
    (
        "left_semi",
        "left_semi",
        "SELECT k, v FROM js WHERE EXISTS (SELECT 1 FROM jb WHERE jb.k = js.k)",
    ),
    (
        "left_anti",
        "left_anti",
        "SELECT k, v FROM js WHERE NOT EXISTS (SELECT 1 FROM jb WHERE jb.k = js.k)",
    ),
]


@pytest.mark.parametrize("name,how,sql", KINDS, ids=[k[0] for k in KINDS])
def test_join_kind_with_nulls_and_dups(tables, name, how, sql):
    sdf_small, sdf_build, con = tables
    if name == "inner":
        out = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, how).select(
            sdf_small.k.alias("k"), "v", "w"
        )
    elif name == "left":
        out = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, how).select(
            sdf_small.k.alias("k"), "v", "w"
        )
    elif name == "right":
        out = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, how).select(
            sdf_build.k.alias("k"), "v", "w"
        )
    elif name == "full":
        out = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, how).select(
            F.coalesce(sdf_small.k, sdf_build.k).alias("k"), "v", "w"
        )
    else:
        out = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, how).select("k", "v")
    check(out, con, sql, name)


def test_null_keys_never_match(tables):
    """Join.h:148-152 — NULL keys fall out of inner joins entirely."""
    sdf_small, sdf_build, _ = tables
    joined = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, "inner")
    assert joined.filter(sdf_small.k.isNull()).count() == 0


def test_null_safe_join_matches_nulls(tables):
    """NullEQ (<=>) — reference tidbNullEQ: NULL keys DO match each other."""
    sdf_small, sdf_build, con = tables
    out = sdf_small.join(sdf_build, sdf_small.k.eqNullSafe(sdf_build.k), "inner").select(
        sdf_small.k.alias("k"), "v", "w"
    )
    sql = "SELECT js.k AS k, v, w FROM js JOIN jb ON js.k IS NOT DISTINCT FROM jb.k"
    check(out, con, sql, "null_safe")
    # the 2 NULL-k small rows × 3 NULL-k build rows = 6 extra vs plain inner
    plain = sdf_small.join(sdf_build, sdf_small.k == sdf_build.k, "inner").count()
    assert out.count() == plain + 6


def test_residual_other_condition_left(tables):
    """Outer join with residual non-equi condition keeps outer rows
    (JoinNonEqualConditions semantics)."""
    sdf_small, sdf_build, con = tables
    out = sdf_small.join(
        sdf_build,
        (sdf_small.k == sdf_build.k) & (sdf_build.w % 2 == 0),
        "left",
    ).select(sdf_small.k.alias("k"), "v", "w")
    sql = "SELECT js.k AS k, v, w FROM js LEFT JOIN jb ON js.k = jb.k AND jb.w % 2 = 0"
    check(out, con, sql, "residual_left")


def test_hot_key_duplication_explodes_correctly(tables):
    """Skewed key 3 (9 small rows × 5 build rows = 45 pairs) — duplicate-key
    hash join fan-out must be exact."""
    sdf_small, sdf_build, _ = tables
    n = (
        sdf_small.filter(F.col("k") == 3)
        .join(sdf_build.filter(F.col("k") == 3), "k", "inner")
        .count()
    )
    small3 = int((SMALL["k"] == 3).sum())
    build3 = int((BUILD["k"] == 3).sum())
    assert n == small3 * build3


def test_two_key_join_with_null_components(tables):
    """Composite keys where one component is NULL — row drops out."""
    sdf_small, sdf_build, con = tables
    out = sdf_small.join(
        sdf_build,
        (sdf_small.k == sdf_build.k) & (sdf_small.k2 == sdf_build.k2),
        "inner",
    ).select(sdf_small.k.alias("k"), sdf_small.k2.alias("k2"), "v", "w")
    sql = """SELECT js.k AS k, js.k2 AS k2, v, w
             FROM js JOIN jb ON js.k = jb.k AND js.k2 = jb.k2"""
    check(out, con, sql, "two_key")


def test_na_in_flag_three_valued(tables):
    """NullAware_LeftOuterSemi flag truth table vs DuckDB's native
    `x IN (subquery)` (gtest_join_executor null-aware cases): TRUE on a
    real match, NULL when unprovable (lhs NULL vs non-empty set, or set
    contains NULL), FALSE only when non-membership is provable."""
    from tiflash_spark.operators.joins import null_aware_in_flag

    sdf_small, sdf_build, con = tables
    out = null_aware_in_flag(sdf_small, "k", sdf_build, "k").select(
        F.col("k").alias("k"), "v", "in_flag"
    )
    sql = "SELECT k, v, k IN (SELECT k FROM jb) AS in_flag FROM js"
    check(out, con, sql, "na_in_flag")


def test_na_not_in_flag_three_valued(tables):
    from tiflash_spark.operators.joins import null_aware_not_in_flag

    sdf_small, sdf_build, con = tables
    out = null_aware_not_in_flag(sdf_small, "k", sdf_build, "k").select(
        F.col("k").alias("k"), "v", "not_in_flag"
    )
    sql = "SELECT k, v, k NOT IN (SELECT k FROM jb) AS not_in_flag FROM js"
    check(out, con, sql, "na_not_in_flag")


def test_na_in_flag_empty_and_allnull_subquery(spark, tables):
    """IN over an EMPTY set is FALSE even for a NULL lhs; over an all-NULL
    set it is NULL for every lhs (nothing provable)."""
    from tiflash_spark.operators.joins import null_aware_in_flag

    sdf_small, sdf_build, _ = tables
    empty = sdf_build.filter(F.col("k") == -999)
    flags = {
        r.k: r.in_flag
        for r in null_aware_in_flag(sdf_small, "k", empty, "k")
        .select("k", "in_flag")
        .distinct()
        .collect()
    }
    assert all(f is False for f in flags.values())

    allnull = sdf_build.filter(F.col("k").isNull())
    out = (
        null_aware_in_flag(sdf_small, "k", allnull, "k")
        .select("in_flag").distinct().collect()
    )
    assert [r.in_flag for r in out] == [None]

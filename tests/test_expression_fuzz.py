"""Property-based scalar-expression parity (extends the directed
test_expression_matrix): random rows flow through a battery of scalar
expressions whose SQL text is SHARED verbatim between Spark SQL and
DuckDB — any divergence in math/string/conditional semantics on the
random inputs fails the hash compare.

Inputs are constrained to the domain where the two engines (and MySQL)
agree by design: finite doubles away from int64 edges, ASCII strings.
Engine-specific edges (overflow wrap, locale case folding) are covered
by the directed mysql_compat tests instead — this suite guards the
COMMON surface against regressions."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiflash_spark.testing import normalize_rows

SAFE_INT = st.integers(min_value=-(10**9), max_value=10**9)
SAFE_DOUBLE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)

EXPRS = """
  i, d, s,
  ABS(i)                            AS abs_i,
  CAST(FLOOR(d) AS BIGINT)          AS floor_d,
  CAST(CEIL(d) AS BIGINT)           AS ceil_d,
  ROUND(d, 2)                       AS round_d,
  SQRT(ABS(d))                      AS sqrt_d,
  LN(1.5 + ABS(d))                  AS ln_d,
  CAST(POWER(ABS(d), 0.5) AS DOUBLE) AS pow_d,
  CAST(SIGN(i) AS BIGINT)           AS sign_i,
  GREATEST(i, 0)                    AS gr_i,
  LEAST(i, 0)                       AS le_i,
  LENGTH(s)                         AS len_s,
  UPPER(s)                          AS up_s,
  LOWER(s)                          AS lo_s,
  TRIM(s)                           AS tr_s,
  SUBSTR(s, 2, 5)                   AS sub_s,
  REVERSE(s)                        AS rev_s,
  REPLACE(s, 'a', 'b')              AS repl_s,
  CONCAT(s, '|', s)                 AS cat_s,
  COALESCE(NULLIF(s, ''), '<empty>') AS nz_s,
  CASE WHEN i > 0 THEN 'pos' WHEN i < 0 THEN 'neg' ELSE 'zero' END AS band,
  CAST(i % 97 AS BIGINT)            AS mod_i
"""


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(SAFE_INT, SAFE_DOUBLE, ASCII), min_size=1, max_size=20
    )
)
def test_scalar_expressions_agree_on_random_rows(spark, rows):
    pdf = pd.DataFrame(rows, columns=["i", "d", "s"])
    spark.createDataFrame(pdf.assign(d=pdf.d.astype("float64"))).createOrReplaceTempView(
        "fuzz_t"
    )
    sql = f"SELECT {EXPRS} FROM fuzz_t"
    sp = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_t", pdf)
    du = con.execute(sql).fetchdf()
    assert normalize_rows(sp) == normalize_rows(du)


TS = st.datetimes(
    min_value=pd.Timestamp("1990-01-03").to_pydatetime(),
    max_value=pd.Timestamp("2030-12-28").to_pydatetime(),
)

DT_EXPRS = """
  ts,
  CAST(YEAR(ts) AS BIGINT)    AS y,
  CAST(MONTH(ts) AS BIGINT)   AS mo,
  CAST(DAY(ts) AS BIGINT)     AS d,
  CAST(HOUR(ts) AS BIGINT)    AS h,
  CAST(MINUTE(ts) AS BIGINT)  AS mi,
  CAST(SECOND(ts) AS BIGINT)  AS sec,
  DATE_TRUNC('day', ts)       AS day_start,
  DATE_TRUNC('hour', ts)      AS hour_start,
  ts + INTERVAL 3 DAY         AS plus3d,
  ts - INTERVAL 2 HOUR        AS minus2h,
  CAST(LAST_DAY(CAST(ts AS DATE)) AS TIMESTAMP) AS eom,
  CAST(CAST(ts AS DATE) AS TIMESTAMP) AS just_date,
  GREATEST(ts, TIMESTAMP '2000-01-01 00:00:00') AS clamped
"""


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(rows=st.lists(TS, min_size=1, max_size=15))
def test_datetime_expressions_agree_on_random_timestamps(spark, rows):
    pdf = pd.DataFrame({"ts": [t.replace(microsecond=0) for t in rows]})
    spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_ts")
    sql = f"SELECT {DT_EXPRS} FROM fuzz_ts"
    sp = spark.sql(sql).toPandas()
    con = duckdb.connect()
    con.register("fuzz_ts", pdf)
    du = con.execute(sql).fetchdf()
    assert normalize_rows(sp) == normalize_rows(du)


DAY_NUM = st.integers(min_value=366, max_value=3_000_000)  # FROM_DAYS domain
TRUNC_D = st.integers(min_value=-3, max_value=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(DAY_NUM, SAFE_DOUBLE, st.integers(min_value=0, max_value=70)),
        min_size=1,
        max_size=20,
    )
)
def test_straggler_functions_agree_on_random_rows(spark, rows):
    """TO_DAYS/FROM_DAYS roundtrip, TRUNCATE at random scales, unsigned
    shifts, XOR — random inputs through the Python helpers vs DuckDB
    arithmetic mirrors (the scalar_stragglers oracle formulas)."""
    import duckdb as _dd
    from pyspark.sql import functions as F

    from tiflash_spark.functions.misc import (
        logical_xor,
        mysql_shiftleft,
        mysql_truncate,
    )
    from tiflash_spark.functions.mysql_compat import mysql_from_days, mysql_to_days

    pdf = pd.DataFrame(rows, columns=["n", "d", "sh"])
    sdf = spark.createDataFrame(pdf.assign(d=pdf.d.astype("float64")))
    got = (
        sdf.select(
            "n",
            mysql_to_days(mysql_from_days(F.col("n"))).alias("roundtrip"),
            F.round(mysql_truncate(F.col("d"), 2), 2).alias("t2"),
            mysql_truncate(F.col("d"), -1).alias("tm1"),
            mysql_shiftleft(F.lit(1), F.col("sh").cast("int"))
            .cast("string")
            .alias("shl"),
            logical_xor(F.col("n") % 2, F.col("sh") % 2).alias("x"),
        )
        .toPandas()
    )
    want = _dd.sql(
        """
        SELECT n,
               n AS roundtrip,
               ROUND(SIGN(d) * FLOOR(ABS(d) * 100) / 100, 2) AS t2,
               SIGN(d) * FLOOR(ABS(d) / 10) * 10 AS tm1,
               CASE WHEN sh > 63 THEN '0' ELSE
                 CAST((CAST(1 AS HUGEINT) << sh)
                      % CAST(18446744073709551616 AS HUGEINT) AS VARCHAR)
               END AS shl,
               CAST((n % 2 <> 0) <> (sh % 2 <> 0) AS INT) AS x
        FROM pdf
        """
    ).df()
    assert normalize_rows(got) == normalize_rows(want)

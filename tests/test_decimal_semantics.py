"""Decimal aggregate semantics (SURVEY.md §2.2: AggregateFunctionSum.cpp
decimal-aware widening; §2.4 arithmetic scale rules). Spark's rules are
pinned here so MySQL-compat gaps are explicit, not silent."""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def dec_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("d152", T.DecimalType(15, 2)),
            T.StructField("d3810", T.DecimalType(38, 10)),
        ]
    )
    rows = [
        (1, Decimal("12345.67"), Decimal("1.0000000001")),
        (2, Decimal("-0.01"), Decimal("2.5")),
        (3, Decimal("99999.99"), None),
    ]
    return spark.createDataFrame(rows, schema)


def test_sum_widens_precision(dec_df):
    out = dec_df.agg(F.sum("d152").alias("s"))
    # Spark: sum(decimal(p,s)) -> decimal(p+10, s) — overflow headroom like
    # the reference's Decimal128/256 promotion
    assert out.schema["s"].dataType == T.DecimalType(25, 2)
    assert out.collect()[0].s == Decimal("112345.65")


def test_avg_scale_plus_four(dec_df):
    out = dec_df.agg(F.avg("d152").alias("a"))
    # MySQL: avg result scale = arg scale + 4; Spark matches this rule
    assert out.schema["a"].dataType.scale == 6
    assert out.collect()[0].a == Decimal("37448.550000")


def test_decimal_mul_scale(dec_df):
    out = dec_df.select((F.col("d152") * F.col("d3810")).alias("m"))
    t = out.schema["m"].dataType
    # p1+p2+1 capped at 38; scale reduced rather than exploding
    assert t.precision == 38
    assert out.filter(F.col("m").isNotNull()).count() == 2


def test_nulls_skipped_in_agg(dec_df):
    r = dec_df.agg(
        F.count("d3810").alias("c"), F.sum("d3810").alias("s"), F.avg("d3810").alias("a")
    ).collect()[0]
    assert r.c == 2
    assert r.s == Decimal("3.5000000001")


def test_overflow_returns_null_non_ansi(spark):
    # non-ANSI (engine mode): decimal overflow -> NULL, like MySQL's soft mode
    df = spark.createDataFrame(
        [(Decimal("9" * 38),)], T.StructType([T.StructField("d", T.DecimalType(38, 0))])
    )
    r = df.select((F.col("d") * F.col("d")).alias("sq")).collect()[0]
    assert r.sq is None


def test_p38_sum_overflow_contract(spark):
    """TiDB supports DECIMAL up to p=65 (SURVEY.md §1.2 documents the
    gap); Spark caps at p=38. The boundary contract, pinned executable:
    sum over decimal(38, s) gets NO widening headroom (38+10 caps back
    to 38), so a sum that exceeds 38 digits returns NULL under the
    engine's non-ANSI conf — never a wrong value, never an exception. A
    user porting p>38 schemas sees NULL-on-overflow, not TiDB's
    Decimal256 result."""
    from decimal import Decimal

    big = Decimal("9" * 38)  # max decimal(38,0)
    df = spark.createDataFrame(
        [(big,), (big,)], T.StructType([T.StructField("d", T.DecimalType(38, 0))])
    )
    out = df.agg(F.sum("d").alias("s"))
    assert out.schema["s"].dataType == T.DecimalType(38, 0)  # no headroom left
    assert out.collect()[0].s is None  # overflow → NULL, silently
    # the SAME sum at p=28 still has widening room and is exact
    df2 = spark.createDataFrame(
        [(Decimal("9" * 28),), (Decimal("9" * 28),)],
        T.StructType([T.StructField("d", T.DecimalType(28, 0))]),
    )
    assert df2.agg(F.sum("d")).collect()[0][0] == Decimal(2 * int("9" * 28))


def test_p38_multiply_loses_scale_not_digits(spark):
    """decimal(38,10) * decimal(38,10): the unbounded result type would
    be (77,20); Spark clamps to (38,6) — integral digits are preserved
    by SACRIFICING scale (spark.sql.decimalOperations.allowPrecisionLoss
    default). Values whose integral part still fits return rounded, a
    true integral overflow returns NULL."""
    from decimal import Decimal

    schema = T.StructType([T.StructField("d", T.DecimalType(38, 10))])
    df = spark.createDataFrame(
        [(Decimal("1234567890.1234567891"),)], schema
    )
    out = df.select((F.col("d") * F.col("d")).alias("m"))
    t = out.schema["m"].dataType
    assert (t.precision, t.scale) == (38, 6)
    got = out.collect()[0].m
    import decimal

    with decimal.localcontext() as ctx:
        ctx.prec = 60  # exact reference square, then round to s=6
        exp = (
            Decimal(12345678901234567891**2).scaleb(-20)
        ).quantize(Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
    assert got == exp
    # integral overflow → NULL
    big = spark.createDataFrame([(Decimal("9" * 28 + "." + "0" * 10),)], schema)
    assert big.select((F.col("d") * F.col("d")).alias("m")).collect()[0].m is None


def test_p38_avg_at_boundary(spark):
    """avg over decimal(38,0): result scale +4 forces precision loss at
    the cap — type is (38,4); values near the cap stay exact in the
    integral part."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("9" * 30),), (Decimal("1"),)],
        T.StructType([T.StructField("d", T.DecimalType(38, 0))]),
    )
    out = df.agg(F.avg("d").alias("a"))
    t = out.schema["a"].dataType
    assert (t.precision, t.scale) == (38, 4)
    assert out.collect()[0].a == (Decimal("9" * 30) + 1) / 2

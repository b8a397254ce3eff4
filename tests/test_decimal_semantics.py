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

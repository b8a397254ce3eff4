"""Source/sink format coverage (SURVEY.md §2.6): results round-trip through
parquet / ORC / CSV / JSON sinks losslessly (the reference's result sink is
a gRPC chunk stream; ours is any Spark writer + Arrow toPandas)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tiflash_spark.operators.relational import q1_pricing_summary


@pytest.fixture(scope="module")
def result(spark):
    return q1_pricing_summary(spark, SF_SMALL)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path_factory, result, fmt):
    path = str(tmp_path_factory.mktemp(f"sink_{fmt}") / "out")
    writer = result.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True).schema(result.schema)
    elif fmt == "json":
        reader = reader.schema(result.schema)
    back = getattr(reader, fmt)(path)
    a = sorted(map(tuple, result.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b, fmt


def test_arrow_topandas_roundtrip(spark, result):
    pdf = result.toPandas()  # Arrow path (session enables it)
    back = spark.createDataFrame(pdf, schema=result.schema)
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, back.collect()))

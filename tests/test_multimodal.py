"""Multimodal plumbing tests: mapInPandas decode schema/batching, empty
payloads, and the aggregate stats query."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMALL
from tiflash_spark.pipeline.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    multimodal_decode,
    synthetic_media,
)


def test_decode_schema_and_hist(spark):
    media = synthetic_media(spark, SF_SMALL)
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.orderBy("media_id").limit(5).collect()
    for r in rows:
        assert r.ok
        assert sum(r.channel_hist) == min(r.n_bytes, 4096)
        assert r.width is not None


def test_decode_empty_payload_row(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, media_type="image/png", payload=b"", meta=Row(declared_w=0, declared_h=0, codec="fake"))],
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("media_type", T.StringType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("declared_w", T.IntegerType()),
                            T.StructField("declared_h", T.IntegerType()),
                            T.StructField("codec", T.StringType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    r = decode_media(df).collect()[0]
    assert not r.ok
    assert r.width is None and r.channel_hist is None


def test_multimodal_rollup_totals(spark):
    out = {r.media_type: r for r in multimodal_decode(spark, SF_SMALL).collect()}
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n for r in out.values()) == n_docs
    assert all(r.n_ok == r.n for r in out.values())

"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns + a typed metadata struct, with
decode / feature-extract / resize / frame-sample implemented as
Arrow-batched pandas iterators over ``mapInPandas`` — the only correct
shape for Python-side media work at 100 TB (batch transfer, no per-row
pickling, decode libraries loaded once per executor, not per row).

The actual byte decoding is STUBBED (no image/audio libs in this
container): `decode_image_stub` produces a deterministic fake decode
(dimensions + channel histogram derived from the bytes themselves), and
the real-library call site is marked. Everything Spark-side — schema,
batching, partition sizing, UDF signatures — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflash_spark.catalog import load_table

# Schema of a multimodal record: opaque payload + typed metadata, the
# pattern the reference uses for its opaque JSON/vector payloads.
MEDIA_SCHEMA = T.StructType(
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
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_hist", T.ArrayType(T.LongType())),
        T.StructField("ok", T.BooleanType()),
    ]
)


def decode_image_stub(payload: bytes, meta: dict[str, Any]) -> dict[str, Any]:
    """Deterministic fake decode.

    REAL IMPLEMENTATION SITE: replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — the surrounding mapInPandas
    plumbing (batching, schema, error row) is what this module tests.
    """
    if payload is None or len(payload) == 0:
        return {"width": None, "height": None, "channel_hist": None, "ok": False}
    # fake dims: bounded function of payload size; fake 4-bin byte histogram
    n = len(payload)
    hist = [0, 0, 0, 0]
    for b in payload[:4096]:
        hist[b & 3] += 1
    w = meta.get("declared_w")
    h = meta.get("declared_h")
    return {
        "width": w if w is not None else (n % 640) + 1,
        "height": h if h is not None else (n % 480) + 1,
        "channel_hist": hist,
        "ok": True,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, decoded features out.

    At scale: repartition upstream so each task holds a bounded byte volume
    (payloads can be MBs — size by bytes, not rows; see
    spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavyweight decoder init would happen HERE, once per task
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = {
                    "declared_w": row.meta.get("declared_w") if row.meta else None,
                    "declared_h": row.meta.get("declared_h") if row.meta else None,
                }
                d = decode_image_stub(row.payload, meta)
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "n_bytes": len(row.payload) if row.payload is not None else 0,
                        "width": d["width"],
                        "height": d["height"],
                        "channel_hist": d["channel_hist"],
                        "ok": d["ok"],
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: text bytes stand in
    for image payloads (no media files in the testdata)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("declared_w"),
            (F.col("n_chars") % 480).cast("int").alias("declared_h"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize media → mapInPandas decode → aggregate stats.
    Aggregated output keeps the driver check stable (per-row hist order
    is deterministic too, but the rollup is the realistic downstream)."""
    decoded = decode_media(synthetic_media(spark, sf_dir))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
            F.sum(F.element_at("channel_hist", 1)).alias("hist0_sum"),
            F.max("width").alias("max_w"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_DECODE_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'image/jpeg'
              ELSE 'audio/wav' END AS media_type,
         ENCODE(text) AS payload,
         CAST(n_chars % 640 AS INT) AS declared_w,
         text
  FROM documents
),
decoded AS (
  -- text payloads are pure ASCII, so byte-level (b & 3) == ascii(char) % 4
  SELECT media_id, media_type,
         OCTET_LENGTH(payload) AS n_bytes,
         CASE WHEN OCTET_LENGTH(payload) = 0 THEN NULL
              ELSE declared_w END AS width,
         CASE WHEN OCTET_LENGTH(payload) > 0 THEN 1 ELSE 0 END AS ok,
         LEN(LIST_FILTER(
           LIST_TRANSFORM(GENERATE_SERIES(1, LEAST(LENGTH(text), 4096)),
                          i -> ASCII(SUBSTRING(text, i, 1)) % 4),
           v -> v = 0)) AS hist0
  FROM media
)
SELECT media_type,
       COUNT(*) AS n,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(ok) AS BIGINT) AS n_ok,
       CAST(SUM(hist0) AS BIGINT) AS hist0_sum,
       MAX(width) AS max_w
FROM decoded
GROUP BY media_type
ORDER BY media_type
"""


QUERIES = {
    "multimodal_decode": multimodal_decode,
}

ORACLE = {
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
}

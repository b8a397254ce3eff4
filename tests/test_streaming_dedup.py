"""Streaming dedup (state-store backed, watermark-bounded) and
stream-static enrichment — the ingest-side guarantees the reference gets
from DeltaTree (handle, version) folding (SURVEY.md §1.5, §2.6)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflash_spark.streaming.dedup import enrich_stream, streaming_dedup

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_drops_redelivery(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "payload": "a"},
            {"ts": "2024-01-01 00:01:30", "doc_id": 1, "payload": "a-dup"},
            {"ts": "2024-01-01 00:02:00", "doc_id": 2, "payload": "b"},
        ],
    )
    deduped = streaming_dedup(
        spark.readStream.schema(SCHEMA).json(src), ["doc_id"], "ts"
    )
    _run(deduped, out, ckpt)

    # a re-delivery in a LATER batch still within the watermark delay
    # must also fold away (state persisted across batches via checkpoint)
    _write(
        f"{src}/b1.json",
        [
            {"ts": "2024-01-01 00:03:00", "doc_id": 2, "payload": "b-dup"},
            {"ts": "2024-01-01 00:04:00", "doc_id": 3, "payload": "c"},
        ],
    )
    deduped2 = streaming_dedup(
        spark.readStream.schema(SCHEMA).json(src), ["doc_id"], "ts"
    )
    _run(deduped2, out, ckpt)

    rows = spark.read.schema(SCHEMA).parquet(out).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r.payload)
    assert sorted(by_id) == [1, 2, 3]
    assert all(len(v) == 1 for v in by_id.values()), by_id
    assert by_id[1] == ["a"] and by_id[2] == ["b"]


def test_stream_static_enrichment_broadcasts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 10, "payload": "x"},
            {"ts": "2024-01-01 00:02:00", "doc_id": 11, "payload": "y"},
        ],
    )
    dim = spark.createDataFrame(
        [(10, "news"), (12, "web")], "doc_id: long, source: string"
    )
    enriched = enrich_stream(
        spark.readStream.schema(SCHEMA).json(src), dim, "doc_id"
    ).select("doc_id", "payload", "source")
    _run(enriched, out, ckpt)

    got = {
        r.doc_id: r.source
        for r in spark.read.parquet(out).collect()
    }
    assert got == {10: "news", 11: None}


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join with event-time range + watermarks — the
    stateful two-sided join (purchases attributed to a click within 10
    minutes). State on both sides is watermark-bounded."""
    clicks_src, buys_src, out, ckpt = (
        str(tmp_path / d) for d in ("clicks", "buys", "out", "ckpt")
    )
    _write(
        f"{clicks_src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "payload": "c1"},
            {"ts": "2024-01-01 00:30:00", "doc_id": 2, "payload": "c2"},
        ],
    )
    _write(
        f"{buys_src}/b0.json",
        [
            {"ts": "2024-01-01 00:05:00", "doc_id": 1, "payload": "b1"},  # +4min: match
            {"ts": "2024-01-01 00:50:00", "doc_id": 2, "payload": "b2"},  # +20min: no match
        ],
    )
    clicks = (
        spark.readStream.schema(SCHEMA).json(clicks_src)
        .withWatermark("ts", "1 hour")
        .select(F.col("doc_id").alias("user"), F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(SCHEMA).json(buys_src)
        .withWatermark("ts", "1 hour")
        .select(F.col("doc_id").alias("buser"), F.col("ts").alias("buy_ts"))
    )
    joined = clicks.join(
        buys,
        (F.col("user") == F.col("buser"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("user", "click_ts", "buy_ts")
    _run(joined, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert [(r.user,) for r in rows] == [(1,)], rows

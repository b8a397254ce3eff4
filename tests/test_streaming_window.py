"""Structured Streaming windowed aggregation with watermark — the
streaming twin of operators/events.events_tumbling_window, proving the
same agg body works under readStream (late rows beyond the watermark are
dropped once the window closes)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_stream_agg(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "event_type": "view", "value": 1.0},
            {"ts": "2024-01-01 00:04:00", "event_type": "view", "value": 2.0},
            {"ts": "2024-01-01 00:07:00", "event_type": "click", "value": 3.0},
            {"ts": "2024-01-01 00:11:00", "event_type": "view", "value": 4.0},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(src)
    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n",
            "total",
        )
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; run a second batch to
    # advance the watermark and flush the rest
    _write(f"{src}/b1.json", [{"ts": "2024-01-01 01:00:00", "event_type": "view", "value": 9.0}])
    q2 = (
        spark.readStream.schema(SCHEMA)
        .json(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {
        (str(r.wstart), r.event_type): (r.n, r.total)
        for r in spark.read.parquet(out).collect()
    }
    # windows 00:00 (2 views), 00:05 (1 click), 00:10 (1 view) all closed
    assert got[("2024-01-01 00:00:00", "view")] == (2, 3.0)
    assert got[("2024-01-01 00:05:00", "click")] == (1, 3.0)
    assert got[("2024-01-01 00:10:00", "view")] == (1, 4.0)

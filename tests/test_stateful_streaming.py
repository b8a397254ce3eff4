"""Custom stateful streaming operator (applyInPandasWithState) — explicit
per-key state carried across micro-batches and query restarts via the
checkpoint (streaming/stateful.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from tiflash_spark.streaming.stateful import running_totals

IN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src, ckpt):
    # foreachBatch sink: supports checkpoint recovery (memory sink doesn't)
    results: dict = {}

    def absorb(batch, _id):
        for r in batch.collect():
            results[r.key] = (r.n_events, r.total)

    stream = spark.readStream.schema(IN_SCHEMA).json(src)
    q = (
        running_totals(stream, "user_id", "value")
        .writeStream.outputMode("update")
        .foreachBatch(absorb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return results


def test_running_totals_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write(
        f"{src}/b0.json",
        [
            {"user_id": 1, "ts": "2024-01-01 00:00:01", "value": 2.0},
            {"user_id": 1, "ts": "2024-01-01 00:00:02", "value": 3.0},
            {"user_id": 2, "ts": "2024-01-01 00:00:03", "value": 5.0},
        ],
    )
    got = _run(spark, src, ckpt)
    assert got == {1: (2, 5.0), 2: (1, 5.0)}

    # restart with a new batch: state must carry over from the checkpoint
    _write(f"{src}/b1.json", [{"user_id": 1, "ts": "2024-01-01 00:01:00", "value": 10.0}])
    got2 = _run(spark, src, ckpt)
    assert got2[1] == (3, 15.0)

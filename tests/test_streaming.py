"""Streaming ingestion test: file-source stream → foreachBatch upsert into
a DeltaStore → snapshot-consistent reads (the reference's Raft-replication
behavior, SURVEY.md §2.6 ingest row)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore
from tiflash_spark.streaming.ingest import start_ingest

SCHEMA = T.StructType(
    [
        T.StructField(HANDLE, T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("is_delete", T.BooleanType()),
    ]
)


def _write_json(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_upserts_and_deletes(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_json(
        f"{src}/batch0.json",
        [
            {HANDLE: 1, "v": "a", "is_delete": False},
            {HANDLE: 2, "v": "b", "is_delete": False},
        ],
    )
    _write_json(
        f"{src}/batch1.json",
        [
            {HANDLE: 1, "v": "a2", "is_delete": False},
            {HANDLE: 2, "v": None, "is_delete": True},
            {HANDLE: 3, "v": "c", "is_delete": False},
        ],
    )

    store = DeltaStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = start_ingest(stream, store, checkpoint=str(tmp_path / "ckpt"), delete_col="is_delete")
    q.awaitTermination(120)

    latest = {r[HANDLE]: r["v"] for r in store.read().collect()}
    assert latest == {1: "a2", 3: "c"}

    # resuming from the checkpoint ingests only NEW files (exactly-once)
    _write_json(f"{src}/batch2.json", [{HANDLE: 2, "v": "back", "is_delete": False}])
    q2 = start_ingest(
        spark.readStream.schema(SCHEMA).json(src),
        store,
        checkpoint=str(tmp_path / "ckpt"),
        delete_col="is_delete",
    )
    q2.awaitTermination(120)
    latest2 = {r[HANDLE]: r["v"] for r in store.read().collect()}
    assert latest2 == {1: "a2", 2: "back", 3: "c"}

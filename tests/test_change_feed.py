"""Change feed: the delta log consumed as a CDC stream (streaming/
change_feed.py) — upserts and deletes arrive as typed events with commit
versions, resume skips already-processed versions."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore
from tiflash_spark.streaming.change_feed import change_feed


def _rows(spark, items):
    return spark.createDataFrame([Row(**{HANDLE: h, "v": v}) for h, v in items])


def _drain(spark, feed, ckpt):
    got = []
    q = (
        feed.writeStream.foreachBatch(lambda b, _id: got.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return got


def test_change_feed_events_and_resume(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "cf"))
    store.write_batch(_rows(spark, [(1, 10), (2, 20)]), version=1)
    store.write_batch(_rows(spark, [(2, 0)]), version=2, delete=True)
    feed = change_feed(spark, store)
    got = _drain(spark, feed, str(tmp_path / "ck1"))
    ev = {(r[HANDLE], r._commit_version, r._change_type) for r in got}
    assert ev == {(1, 1, "upsert"), (2, 1, "upsert"), (2, 2, "delete")}
    # resume watermark: a consumer that already has v1 sees only v2+
    got2 = _drain(
        spark, change_feed(spark, store, since_version=1), str(tmp_path / "ck2")
    )
    assert {(r[HANDLE], r._change_type) for r in got2} == {(2, "delete")}
    # the SAME checkpointed query picks up only NEW batches on re-run
    store.write_batch(_rows(spark, [(3, 30)]), version=3)
    got3 = _drain(spark, change_feed(spark, store), str(tmp_path / "ck1"))
    assert {(r[HANDLE], r._commit_version) for r in got3} == {(3, 3)}


def test_change_feed_on_compacted_store_sees_future_writes(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "cf2"))
    store.write_batch(_rows(spark, [(1, 10)]), version=1)
    store.compact(ts=1, num_segments=2)  # delta now empty
    feed = change_feed(spark, store)
    store.write_batch(_rows(spark, [(5, 50)]), version=2)
    got = _drain(spark, feed, str(tmp_path / "ck"))
    assert [(r[HANDLE], r.v, r._change_type) for r in got] == [(5, 50, "upsert")]


def test_change_feed_empty_store_raises(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "cf3"))
    with pytest.raises(ValueError, match="empty store"):
        change_feed(spark, store)

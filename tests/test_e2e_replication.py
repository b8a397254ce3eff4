"""End-to-end replication loop (TODO item 8): real events data → streamed
in file batches → DeltaStore via foreachBatch ingestion → snapshot queries
between batches see consistent, monotonically growing state — the full
reference behavior (Raft replication + coprocessor reads) in one test."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tiflash_spark.catalog import load_table
from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore
from tiflash_spark.streaming.ingest import start_ingest


def test_replicate_events_and_query(spark, tmp_path):
    src = str(tmp_path / "in")
    events = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_id") < 300)
        .select(
            F.col("event_id").alias(HANDLE),
            "user_id",
            "event_type",
            "value",
        )
    )
    # three "arrival" files ≈ three replication batches
    parts = [
        events.filter(F.col(HANDLE) < 100),
        events.filter((F.col(HANDLE) >= 100) & (F.col(HANDLE) < 200)),
        events.filter(F.col(HANDLE) >= 200),
    ]
    store = DeltaStore(spark, str(tmp_path / "store"))
    schema = events.schema
    totals = []
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").json(f"{src}/batch{i}")
        stream = spark.readStream.schema(schema).json(f"{src}/batch{i}")
        q = start_ingest(stream, store, checkpoint=str(tmp_path / f"ckpt{i}"), base_version=i * 10)
        q.awaitTermination(120)
        snap = store.read()
        totals.append(snap.count())
        # snapshot is exactly the union of everything replicated so far
        assert totals[-1] == sum(p.count() for p in parts[: i + 1])

    # queries over the replicated store match queries over the source
    got = {
        r.event_type: r.n
        for r in store.read().groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want

    # an update arriving later (same handle, higher version) wins in reads
    upd = spark.createDataFrame([(0, 999, "corrected", 0.0)], schema)
    store.write_batch(upd, version=100)
    row = store.read().filter(F.col(HANDLE) == 0).collect()[0]
    assert row.event_type == "corrected"

    # compaction with segments preserves all of it
    kept = store.compact(ts=200, num_segments=4)
    assert kept == totals[-1]
    assert store.read().filter(F.col(HANDLE) == 0).collect()[0].event_type == "corrected"

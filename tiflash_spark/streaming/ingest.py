"""Streaming upsert ingestion into a DeltaStore.

Reference path (SURVEY.md §2.6): Raft log apply → RegionBlockReader decode
→ DeltaMergeStore::write, continuously. Spark-first: any readStream source
(file/Kafka/rate) → ``foreachBatch`` → DeltaStore.write_batch, with the
micro-batch id as the commit version — monotonic, exactly the version
semantics the MVCC snapshot read expects. Readers see batch N fully or not
at all (snapshot isolation per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tiflash_spark.sources.delta_store import DeltaStore


def start_ingest(
    stream: DataFrame,
    store: DeltaStore,
    checkpoint: str,
    delete_col: str | None = None,
    base_version: int = 0,
    remote_root: str | None = None,
    store_id: str = "store_1",
    upload_every: int = 5,
) -> StreamingQuery:
    """Attach a streaming DataFrame to a DeltaStore as its replication feed.

    ``delete_col``: optional boolean column marking delete events (the KV
    decode path distinguishes PUT/DELETE the same way).

    ``remote_root``: when set, the write node uploads a remote checkpoint
    every ``upload_every`` micro-batches — the cloud-native design doc's
    periodic S3 upload ("we upload data periodically, for example 30s"),
    keyed to batch cadence rather than wall clock so resume semantics
    stay exactly-once: a replayed micro-batch re-uploads the same
    snapshot, and the manifest-last commit keeps read nodes consistent
    either way.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # two version slots per micro-batch: upserts commit first, deletes
        # after — a file source may fold several logical batches into one
        # micro-batch, and a same-version upsert/delete pair of one handle
        # must still resolve to "deleted"
        version = base_version + (batch_id + 1) * 2
        if delete_col is not None:
            # NULL flag ≡ not-a-delete: bare filter(col)/filter(NOT col)
            # would drop NULL-flag rows from BOTH branches (three-valued
            # logic), silently losing them from the replication feed
            is_del = f"coalesce({delete_col}, false)"
            dels = batch.filter(is_del).drop(delete_col)
            ups = batch.filter(f"NOT {is_del}").drop(delete_col)
            # write unconditionally: an empty-side append is a no-op-sized
            # parquet file, cheaper than a limit(1).count() probe job per
            # side per micro-batch at high batch rates
            store.write_batch(ups, version, delete=False)
            store.write_batch(dels, version + 1, delete=True)
        else:
            store.write_batch(batch, version, delete=False)
        if remote_root is not None and (batch_id + 1) % upload_every == 0:
            from tiflash_spark.sources.remote_store import checkpoint as rs_ckpt

            rs_ckpt(store, remote_root, store_id=store_id, version=version + 1)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

"""Change feed over a DeltaStore: stream the delta log as CDC events.

The store's delta layer is an append-only upsert/delete log — each
write_batch lands one immutable parquet batch directory stamped with a
commit version and a delete mark (sources/delta_store.py). That is
exactly the shape Structured Streaming's file source consumes: new
batch files become new micro-batches, exactly-once via the stream's own
checkpoint. Downstream incremental pipelines (index maintenance,
curation deltas, replication fan-out) subscribe here instead of
re-scanning the table — the pattern the reference enables by being a
Raft-log CONSUMER (its learner reads feed it deltas the same way;
SURVEY.md §2.6, Storages/KVStore/).

Caveats, stated plainly:
- Compaction retires the delta directory; a feed only sees events that
  arrive while it runs. Coordinate compaction cadence with feed uptime
  (or re-bootstrap from a checkpoint + watermark, the disagg tail
  pattern in sources/remote_store.py).
- Events within one micro-batch are unordered; the commit version
  column orders them logically, exactly as MVCC readers use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.operators.mvcc import DELMARK, VERSION
from tiflash_spark.sources.delta_store import DeltaStore

__all__ = ["change_feed"]


def change_feed(
    spark: SparkSession,
    store: DeltaStore,
    since_version: int | None = None,
) -> DataFrame:
    """A streaming DataFrame of the store's change events: user columns
    plus ``_change_type`` ('upsert' | 'delete') and ``_commit_version``.
    ``since_version``: drop events at or below a watermark (resuming
    consumers pass the version they already processed)."""
    stable = store._layer("stable")
    delta = store._layer("delta")
    if delta is not None:
        schema = delta.schema
    elif stable is not None:
        # compacted store with an empty delta: future events carry the
        # stable's user schema (minus the segment partition column)
        schema = stable.drop("_seg").schema if "_seg" in stable.columns else stable.schema
    else:
        raise ValueError(f"empty store at {store.path}")
    feed = spark.readStream.schema(schema).parquet(store.delta_path())
    if since_version is not None:
        feed = feed.filter(F.col(VERSION) > F.lit(since_version))
    out = feed.withColumn(
        "_change_type",
        F.when(F.col(DELMARK) == 1, F.lit("delete")).otherwise(F.lit("upsert")),
    ).withColumnRenamed(VERSION, "_commit_version")
    return out.drop(DELMARK)

"""Streaming deduplication and stream-static enrichment.

The reference ingests Raft logs where region re-sends make duplicate
delivery a fact of life; DeltaTree folds duplicates by (handle, version)
at read time (SURVEY.md §1.5). On the streaming side Spark gives the
same guarantee *before* storage: state-store-backed dropDuplicates with
a watermark bounds the dedup state in time, so re-delivered rows within
the delay window fold to one and state is evicted once the watermark
passes (at scale the state store is RocksDB; state size is
O(keys-per-window), not O(stream)).

``enrich_stream`` is the stream-static broadcast join every ingest
pipeline runs (dimension lookup at append time) — Spark re-plans the
static side per micro-batch, so a dimension refresh is picked up without
restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_dedup", "enrich_stream"]


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key within the watermark delay.
    State is bounded: keys older than the watermark are evicted, so a
    key re-appearing AFTER the window is treated as new (exactly the
    at-least-once → effectively-once contract of log ingestion)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static dimension join; the static side broadcasts per
    micro-batch (it must stay dimension-sized — the same contract as the
    batch-side broadcast joins in operators/joins.py)."""
    return stream.join(F.broadcast(dim), on, how)

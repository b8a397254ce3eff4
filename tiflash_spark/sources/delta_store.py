"""DeltaStore: DeltaTree-style MVCC table on Parquet (SURVEY.md §1.5).

Reference architecture: a table = PK-range-partitioned Segments, each a
sorted/compacted **stable layer** (DMFile packs) plus a **delta layer** of
recent writes, merged at read time with MVCC version filtering
(dbms/src/Storages/DeltaMerge/DeltaMergeStore.h:107, Segment.cpp,
DeltaMerge.h). Hidden per-row columns: handle `_tidb_rowid`, commit
version `_INTERNAL_VERSION`, delete mark `_INTERNAL_DELMARK`
(dbms/src/Storages/MutableSupport.h:44-54).

Spark-first layout:
- ``stable/`` — compacted parquet, one row per live handle, sorted by
  handle within files (parquet row-group stats ≈ the pack min-max index).
- ``delta/``  — append-only upsert/delete log parquet; each write job
  appends one batch directory, never rewrites.
- read(ts)   — union(stable, delta) → window-dedup by handle on newest
  version <= ts, drop delmarks (operators/mvcc.py.snapshot_read).
- compact(ts)— fold delta into a new stable snapshot; readers pick the new
  version dir atomically (_CURRENT pointer file).

Scale notes: the delta tail stays small relative to stable (compaction
cadence controls it); snapshot reads shuffle only the delta+stable rows of
the handles being read after partition pruning. Writes are blind appends —
no read-modify-write, so streaming ingestion (streaming/ingest.py) needs
no locks, matching the reference's Raft-apply write path.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.operators.mvcc import DELMARK, HANDLE, VERSION, snapshot_read


class DeltaStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "delta"), exist_ok=True)
        os.makedirs(os.path.join(path, "stable"), exist_ok=True)

    # --- write path --------------------------------------------------------

    def write_batch(self, df: DataFrame, version: int, delete: bool = False) -> None:
        """Append one upsert/delete batch to the delta layer.

        ``df`` must carry the handle column; version stamps every row
        (≈ commit-ts of the Raft batch, reference PartitionStreams.cpp
        writeRegionDataToStorage).
        """
        out = df.withColumn(VERSION, F.lit(version).cast("long")).withColumn(
            DELMARK, F.lit(1 if delete else 0).cast("int")
        )
        out.write.mode("append").parquet(os.path.join(self.path, "delta"))

    # --- read path ---------------------------------------------------------

    def _layer(self, name: str) -> DataFrame | None:
        p = os.path.join(self.path, name)
        try:
            df = self.spark.read.parquet(p)
            return df if df.columns else None
        except Exception:
            return None  # empty layer

    def log(self) -> DataFrame:
        """The full merged log (stable rows carry their compacted version)."""
        parts = [d for d in (self._layer("stable"), self._layer("delta")) if d is not None]
        if not parts:
            raise ValueError(f"empty store at {self.path}")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read(self, ts: int | None = None) -> DataFrame:
        """Snapshot-consistent read at version ts (None = everything)."""
        return snapshot_read(self.log(), read_ts=ts).drop(VERSION, DELMARK)

    # --- maintenance -------------------------------------------------------

    def compact(self, ts: int) -> int:
        """Fold delta into stable up to version ts (≈ delta merge,
        reference Segment delta→stable merge). Returns live rows kept.

        Tombstones at or below ts are garbage-collected: after folding,
        nothing older than ts can need them (the reference keeps them until
        GC-safe-point — same rule)."""
        merged = snapshot_read(self.log(), read_ts=ts)
        tmp = os.path.join(self.path, f"stable_new_{int(time.time() * 1000)}")
        (
            merged.repartition(HANDLE)
            .sortWithinPartitions(HANDLE)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        n = self.spark.read.parquet(tmp).count()
        # atomic-ish swap: retire old layers, promote the new stable
        import shutil

        for name in ("stable", "delta"):
            shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
        os.rename(tmp, os.path.join(self.path, "stable"))
        os.makedirs(os.path.join(self.path, "delta"), exist_ok=True)
        return n

"""SparkSession factory tuned for the engine.

The reference executes pre-optimized plans on a vectorized columnar runtime
with pipeline scheduling and auto-spill (SURVEY.md §3-§4); on Spark all of
that is built in — this module just pins the configs that matter for
correctness (UTC session time zone, ANSI off for MySQL-ish NULL-on-error
semantics) and for scale (AQE, skew-join handling, Arrow transfers,
partition sizing).

Scale notes (100 TB target):
- AQE re-plans shuffles at runtime (partition coalescing, skew-join split,
  dynamic broadcast) — the Spark analogue of TiFlash's fine-grained shuffle
  and auto pass-through agg (SURVEY.md §4).
- ``spark.sql.files.maxPartitionBytes`` keeps scan tasks bounded regardless
  of input size; shuffle partition count is only the *initial* value under
  AQE, so the same code runs at sf0.001 and at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "tiflash_spark", master: str | None = None) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness ---
        # MySQL/TiDB semantics: errors become NULL/truncation, never exceptions
        # (reference: tidb_cast / tidbDivide, SURVEY.md §2.4).
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic timestamp <-> date behavior, matches DuckDB's naive reads.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # parquet TIMESTAMP(NANOS) (events.ts) reads as long; the catalog
        # converts ns → TimestampType losslessly (data is µs-precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scale / performance ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Runtime bloom filters ≈ TiFlash runtime filters (SURVEY.md §4).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow for any pandas-UDF path and collect/toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Progress bars interleave with stdout and can truncate the one-line
        # JSON contract bench.py prints (the driver parses it).
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()

"""MVCC snapshot reads — the DeltaTree merge-on-read semantics on Spark.

Reference (SURVEY.md §1.5): every TiFlash row carries hidden columns
`_tidb_rowid` (handle, col_id -1), `_INTERNAL_VERSION` (-1024) and
`_INTERNAL_DELMARK` (-1025) (dbms/src/Storages/MutableSupport.h:44-54). A
read at snapshot `ts` sort-merges delta+stable by handle, keeps the newest
version <= ts and drops delete-marked rows
(DMVersionFilterBlockInputStream.h:30-44, modes MVCC/COMPACT). Read modes
Normal / Fast / Raw (ReadMode.h:20-39): Fast skips the version dedup and
only drops delete marks.

Spark-first: the log is just a table; snapshot read = one window dedup —
  row_number() OVER (PARTITION BY handle ORDER BY version DESC) = 1
exactly the Delta-Lake/Hudi merge-on-read pattern. At scale the log is
bucketed by handle so the window is a local sort, no extra shuffle after
the first; compaction (sources/delta_store.py) keeps the unmerged tail
small, mirroring delta→stable merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table

HANDLE = "_tidb_rowid"
VERSION = "_INTERNAL_VERSION"
DELMARK = "_INTERNAL_DELMARK"


def snapshot_read(
    log: DataFrame, read_ts: int | None = None, tiebreak: list[str] | None = None
) -> DataFrame:
    """Normal read mode: newest version <= read_ts per handle, delmarks dropped.

    Reference: DMVersionFilterBlockInputStream mode MVCC. In TiFlash,
    (handle, version) is unique by construction (commit-ts); logs built from
    external data may have ties — pass `tiebreak` columns to make the pick
    total and deterministic.
    """
    if read_ts is not None:
        log = log.filter(F.col(VERSION) <= read_ts)
    # delete-wins on version ties: a same-version upsert/delete pair of one
    # handle must deterministically resolve to "deleted"
    order = [F.col(VERSION).desc(), F.col(DELMARK).desc()] + [
        F.col(c).desc() for c in (tiebreak or []) if c != DELMARK
    ]
    w = Window.partitionBy(HANDLE).orderBy(*order)
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(DELMARK) == 0))
        .drop("_rn")
    )


def bitmap_scan(
    log: DataFrame,
    read_ts: int | None = None,
    tiebreak: list[str] | None = None,
    dedup_exact: bool = False,
) -> DataFrame:
    """Bitmap read mode (ReadMode.h:39; docs/design/
    2022-12-08-support-MVCC-bitmap-filter.md): same visible-row semantics as
    snapshot_read, different physical strategy — phase 1 computes the
    per-handle winner key as a bitmap-like narrow frame (handle, winning
    version key), phase 2 semi-joins the full-width rows against it.

    Why it exists at scale: the winner is a ``max(struct(version, delmark,
    tiebreaks))`` aggregate (SortAggregate — struct buffers aren't
    hash-aggregable), which still gets map-side partial aggregation: each
    task reduces its own versions of a handle before the shuffle, so the
    winner exchange carries ~one NARROW row per handle instead of every
    full-width version (the window form shuffles the entire log at full
    width, then sorts it). On a log with deep version chains (hot handles)
    this is the plan you want; on a mostly-compacted log the window form
    avoids scanning twice. Both modes are offered, like the reference's
    Normal vs Bitmap.

    Struct-max ordering (version, delmark, tiebreaks) reproduces
    snapshot_read's (version DESC, delmark DESC, ...) pick exactly,
    including delete-wins on version ties. As with snapshot_read, the pick
    is total only if (handle, version) is unique or ``tiebreak`` makes it
    so.

    MULTIPLICITY CONTRACT: when the log contains FULLY-duplicated rows
    (identical handle, version, delmark AND tiebreaks — impossible in a
    real commit-ts log, possible in synthetic ones), the semi-join keeps
    every copy of the winning row, where the window form keeps exactly
    one. Pass ``dedup_exact=True`` to restore one-row-per-winner parity;
    it costs one extra exchange over the (already MVCC-deduped, ≈ one
    row per handle) output, so the narrow winner shuffle that motivates
    bitmap mode is preserved."""
    if read_ts is not None:
        log = log.filter(F.col(VERSION) <= read_ts)
    keycols = [VERSION, DELMARK] + [c for c in (tiebreak or []) if c != DELMARK]
    win = log.groupBy(HANDLE).agg(
        F.max(F.struct(*[F.col(c) for c in keycols])).alias("_mvcc_win")
    )
    visible = win.filter(F.col(f"_mvcc_win.{DELMARK}") == 0).select(
        HANDLE, *[F.col(f"_mvcc_win.{c}").alias(c) for c in keycols]
    )
    out = log.join(visible, on=[HANDLE, *keycols], how="left_semi")
    return out.dropDuplicates() if dedup_exact else out


def fast_scan(log: DataFrame) -> DataFrame:
    """Fast read mode: skip the sort-merge MVCC dedup, just drop delete rows
    (ReadMode.h:27-33 — trades snapshot consistency for throughput)."""
    return log.filter(F.col(DELMARK) == 0)


def raw_scan(log: DataFrame) -> DataFrame:
    """Raw read mode: everything, hidden columns included (ReadMode.h:35)."""
    return log


def compact(log: DataFrame, compact_ts: int) -> DataFrame:
    """COMPACT filter mode (DMVersionFilterBlockInputStream.h:37-44): keep,
    per handle, the newest version <= compact_ts (even if delete-marked, so
    the tombstone survives until GC) plus every version > compact_ts.
    Same-version upsert/delete ties resolve delete-wins, matching
    snapshot_read."""
    w = Window.partitionBy(HANDLE).orderBy(F.col(VERSION).desc(), F.col(DELMARK).desc())
    older = (
        log.filter(F.col(VERSION) <= compact_ts)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    newer = log.filter(F.col(VERSION) > compact_ts)
    return older.unionByName(newer)


def _synthetic_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic upsert log derived from lineitem so the driver's DuckDB
    oracle can rebuild the identical log in SQL: handle = l_orderkey,
    version = l_linenumber, delete when l_returnflag = 'R'.

    The NARROW projection (5 of lineitem's 11 columns — handle, version,
    delmark and the two tiebreak payloads the winner key needs) is
    persisted: bitmap mode's two legs (winner aggregate + semi-join back)
    and the sibling mvcc queries all derive from this one frame, so the
    parquet is scanned once per session instead of twice per bitmap run
    (measured r11, 6 interleaved trials: bitmap 6.14 → 5.79 s sum, winner
    6/6; snapshot wash — it already had one scan). CacheManager keys by
    analyzed plan → ONE entry per sf_dir shared by all three queries.
    This caches the driver FIXTURE only; the mode operators
    (snapshot_read / bitmap_scan) still take any uncached frame, and at
    100 TB the winner-exchange-narrow story is unchanged."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias(HANDLE),
        F.col("l_linenumber").cast("long").alias(VERSION),
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0)).alias(DELMARK),
        F.col("l_partkey").alias("a"),
        F.col("l_extendedprice").alias("b"),
    ).persist()


def mvcc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot read at version 4 over the synthetic log, aggregated.
    The synthetic log has (handle, version) ties, so the pick is totally
    ordered by (version, delmark, a, b) on both engines."""
    snap = snapshot_read(
        _synthetic_log(spark, sf_dir), read_ts=4, tiebreak=[DELMARK, "a", "b"]
    )
    # snapshot_read keeps exactly the _rn == 1 row of each handle's window
    # partition, so HANDLE is unique in `snap` by construction and
    # COUNT(handle) ≡ COUNT(DISTINCT handle) — the plain count avoids
    # Spark's distinct-aggregate Expand (3× the rows through the aggregate
    # + an extra exchange). NOT valid for bitmap mode, whose semi-join
    # preserves log multiplicity (see bitmap_scan's contract).
    return snap.agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.sum("a").alias("sum_a"),
        F.round(F.sum("b"), 2).alias("sum_b"),
        F.count(HANDLE).alias("n_handles"),
    )


MVCC_SNAPSHOT_SQL = """
WITH log AS (
  SELECT l_orderkey AS handle,
         CAST(l_linenumber AS BIGINT) AS version,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS delmark,
         l_partkey AS a,
         l_extendedprice AS b
  FROM lineitem
),
snap AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY handle
      ORDER BY version DESC, delmark DESC, a DESC, b DESC) AS rn
    FROM log WHERE version <= 4
  ) t WHERE rn = 1 AND delmark = 0
)
SELECT COUNT(*) AS n_visible,
       CAST(SUM(a) AS BIGINT) AS sum_a,
       ROUND(SUM(b), 2) AS sum_b,
       COUNT(DISTINCT handle) AS n_handles
FROM snap
"""


def mvcc_fast_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast-scan mode over the same log (no dedup, drop deletes)."""
    fast = fast_scan(_synthetic_log(spark, sf_dir))
    return fast.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("a").alias("sum_a"),
        F.countDistinct(HANDLE).alias("n_handles"),
    )


MVCC_FAST_SCAN_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(l_partkey) AS BIGINT) AS sum_a,
       COUNT(DISTINCT l_orderkey) AS n_handles
FROM lineitem
WHERE l_returnflag <> 'R'
"""


def mvcc_bitmap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-mode read of the same snapshot as mvcc_snapshot — identical
    visible rows (same oracle), different physical plan (agg + semi-join
    instead of window sort; see bitmap_scan)."""
    snap = bitmap_scan(
        _synthetic_log(spark, sf_dir), read_ts=4, tiebreak=[DELMARK, "a", "b"]
    )
    return snap.agg(
        F.count(F.lit(1)).alias("n_visible"),
        F.sum("a").alias("sum_a"),
        F.round(F.sum("b"), 2).alias("sum_b"),
        F.countDistinct(HANDLE).alias("n_handles"),
    )


QUERIES = {
    "mvcc_snapshot": mvcc_snapshot,
    "mvcc_fast_scan": mvcc_fast_scan,
    "mvcc_bitmap_scan": mvcc_bitmap_scan,
}

ORACLE = {
    "mvcc_snapshot": MVCC_SNAPSHOT_SQL,
    "mvcc_fast_scan": MVCC_FAST_SCAN_SQL,
    # bitmap mode answers the same snapshot question — same oracle
    "mvcc_bitmap_scan": MVCC_SNAPSHOT_SQL,
}

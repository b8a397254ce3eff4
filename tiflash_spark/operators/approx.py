"""Approximate aggregates — the reference's sketch surface.

ApproxCountDistinct is TiFlash's only sketch aggregate (uniqRawRes HLL,
dbms/src/AggregateFunctions/AggregateFunctionUniq.cpp, SURVEY.md §2.2);
Spark's approx_count_distinct is likewise HLL++. Sketch values differ
between engines by design, so the driver check is rows-only and
tests/test_approx.py bounds the relative error against the exact NDV.
percentile_approx is Spark-free extra surface (not in the reference map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table


def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL NDV per returnflag vs exact, with relative error computed in-plan
    so the output itself witnesses the bound."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            "exact_parts",
            F.round(
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx over order totals per priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("p50"),
            F.round(F.percentile_approx("o_totalprice", 0.95, 10000), 2).alias("p95"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "approx_count_distinct": approx_count_distinct,  # sketch: rows-only
    "approx_quantiles": approx_quantiles,  # sketch: rows-only
}

ORACLE: dict[str, str] = {}


def approx_heavy_hitters(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Heavy hitters via count-min sketch: ONE ungrouped aggregate builds
    the CMS over every token (per-task sketches merge map-side — the
    whole corpus contributes without a token shuffle), then the driver
    deserializes the sketch (bounded: ~KBs) and estimates counts for the
    exact top-k tokens so the result carries estimate vs truth side by
    side. The CMS guarantee (est >= exact, overcount <= eps·N w.p.
    confidence) is pinned in tests/test_approx.py.

    rows-only driver check: DuckDB has no CMS (sketch family, like HLL).
    """
    from pyspark.sql import types as T

    from tiflash_spark.pipeline.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    sk_row = toks.agg(
        F.expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").alias("sk"),
        F.count(F.lit(1)).alias("n_total"),
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row.sk)
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.col("exact").desc(), F.col("tok"))
        .limit(k)
        .collect()
    )
    rows = [
        (r.tok, int(sketch.estimateCount(r.tok)), int(r.exact),
         int(sk_row.n_total))
        for r in exact
    ]
    return spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("tok", T.StringType()),
            T.StructField("est", T.LongType()),
            T.StructField("exact", T.LongType()),
            T.StructField("n_total", T.LongType()),
        ]),
    ).orderBy(F.col("exact").desc(), F.col("tok"))


QUERIES["approx_heavy_hitters"] = approx_heavy_hitters  # sketch: rows-only

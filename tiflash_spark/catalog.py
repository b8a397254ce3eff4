"""Explicit-schema catalog over the driver's parquet tables.

The reference never infers schemas — TableInfo/ColumnInfo are pushed from
TiDB's catalog and kept in sync by a schema syncer
(reference: dbms/src/TiDB/Schema/TiDB.h:107, SchemaBuilder.cpp; SURVEY.md
§1.3). We mirror that: every table the engine serves has a declared
StructType here, reads validate against it, and nothing ever calls
``inferSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Declared schemas for the driver-generated tables (TESTDATA.md).
# Parquet supplies physical types; these are the engine-surface types we
# assert on (SURVEY.md §1.2 mapping).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)

# Constant-size dimension tables (O(1) rows regardless of scale factor)
# that are always safe to F.broadcast(). customer/supplier/part grow
# linearly with sf — a forced broadcast hint bypasses
# autoBroadcastJoinThreshold and becomes a guaranteed OOM at 100 TB, so
# those are left to AQE to pick broadcast-vs-shuffle from runtime sizes.
BROADCAST_TABLES = frozenset({"region", "nation"})


def ensure_engine_confs(spark: SparkSession) -> None:
    """Runtime confs the engine's MySQL/TiDB semantics depend on, set here
    because callers (the driver) may hand us a default-config session:
    Spark 4 defaults to ANSI mode, but the reference's semantics are
    error-as-NULL (tidb_cast / tidbDivide — SURVEY.md §2.4)."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; column pruning/predicate pushdown reach the scan."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(SCHEMAS)}")
    ensure_engine_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # parquet stores ts as TIMESTAMP(NANOS), illegal for Spark's reader;
        # read it as long (runtime-settable legacy conf — the caller's session
        # may not have it) and convert ns → µs, exact since data is µs-precision.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def validate_schema(df: DataFrame, name: str) -> None:
    """Assert a loaded table matches the declared catalog schema by name/type."""
    declared = {f.name: f.dataType.simpleString() for f in SCHEMAS[name].fields}
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = set(declared) - set(actual)
    if missing:
        raise ValueError(f"table {name}: missing columns {sorted(missing)}")

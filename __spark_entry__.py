"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from tiflash_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing registry (≤50 entries — the gate records only the
    first 50): high-value queries 1:1 plus digest-merged operator
    families so EVERY operator from SURVEY.md §2 gets a CORRECTNESS row
    each round. Fine-grained per-operator queries: extended_queries()."""
    from tiflash_spark.driver_registry import driver_queries

    return driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle SQL for each oracle-checkable driver query."""
    from tiflash_spark.driver_registry import driver_oracles

    return driver_oracles()


def extended_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full fine-grained registry (one entry per operator), checked
    row-for-row by scripts/parity_check.py and tests/test_oracle_parity."""
    from tiflash_spark.registry import all_queries

    return all_queries()


def extended_oracle_sql() -> dict[str, str]:
    from tiflash_spark.registry import all_oracles

    return all_oracles()

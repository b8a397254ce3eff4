"""Physical-plan inspection helpers.

The reference pins plan shapes with golden files
(dbms/src/Flash/tests/gtest_planner_interpreter.out,
gtest_pipeline_interpreter.out — SURVEY.md §5). Our analogue: assertions
over Catalyst's formatted explain output — pushdown reached the scan,
column pruning took effect, the intended join strategy was chosen, shuffle
counts are bounded. These are the properties that decide 100 TB viability,
so they're tested, not hoped for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def count_operator(df: DataFrame, name: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'SortMergeJoin', 'Exchange', 'HashAggregate') in the plan tree."""
    plan = formatted_plan(df)
    return len(re.findall(rf"\b{re.escape(name)}\b", plan.split("\n\n")[0]))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges).

    `\\bExchange\\b` alone already cannot match inside `BroadcastExchange`
    (preceded by a word char), so count it once — subtracting broadcast
    matches on top of that double-counts them and can go negative."""
    plan = formatted_plan(df).split("\n\n")[0]
    return len(re.findall(r"(?<!Broadcast)\bExchange\b", plan))


def assert_scan_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Assert no scan reads more columns than declared necessary."""
    for schema in read_schemas(df):
        ncols = len(schema.split(",")) if schema else 0
        assert ncols <= max(table_cols.values()), f"unpruned scan: {schema}"


def has_filter_pushdown(df: DataFrame) -> bool:
    return any(f.strip() for f in pushed_filters(df))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen spans — wider is better (fewer breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))

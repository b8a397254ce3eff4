"""Aggregates QUERIES/ORACLE dicts from every operator module.

The set of names here is the engine's public query surface — the driver's
correctness gate iterates it, and tests/test_oracle_parity.py replays the
same comparison locally at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "tiflash_spark.operators.relational",
    "tiflash_spark.operators.joins",
    "tiflash_spark.operators.windows",
    "tiflash_spark.operators.grouping",
    "tiflash_spark.operators.mvcc",
    "tiflash_spark.operators.scalars",
    "tiflash_spark.operators.events",
    "tiflash_spark.operators.tpch",
    "tiflash_spark.operators.tpcds",
    "tiflash_spark.operators.approx",
    "tiflash_spark.operators.temporal",
    "tiflash_spark.operators.runtime_filter",
    "tiflash_spark.pipeline.text",
    "tiflash_spark.pipeline.fulltext",
    "tiflash_spark.pipeline.dedup",
    "tiflash_spark.pipeline.similarity",
    "tiflash_spark.pipeline.multimodal",
    "tiflash_spark.pipeline.curation",
]


def _load() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE", {}))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]

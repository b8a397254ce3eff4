"""tiflash_spark — a PySpark-native analytics engine with TiFlash's capabilities.

A from-scratch, idiomatic PySpark engine (DataFrame / Spark SQL / Catalyst /
Structured Streaming over columnar Parquet) reproducing the query and
data-processing capabilities of pingcap/tiflash (reference read-only at
/root/reference — see SURVEY.md for the structural analysis with file:line
citations). This is NOT a port: TiDB plans + TiFlash executes ≈ Catalyst +
Tungsten, so the engine here is a library of operator builders, a
MySQL-semantics function layer, an MVCC snapshot-read table layer, and
large-scale data-pipeline operators (dedup / similarity / text analysis),
all expressed as declarative DataFrame plans that Catalyst optimizes.
"""

from tiflash_spark.session import get_spark


def __getattr__(name: str):
    # lazy re-exports: the public API surface without import-time cost
    if name == "open_catalog":
        from tiflash_spark.catalog import open_catalog

        return open_catalog
    if name == "DeltaStore":
        from tiflash_spark.sources.delta_store import DeltaStore

        return DeltaStore
    if name in ("ReadNodeStore", "checkpoint", "restore_store", "remote_compact"):
        from tiflash_spark.sources import remote_store

        return getattr(remote_store, name)
    if name == "run_sql":
        from tiflash_spark.sources.admin_sql import run_sql

        return run_sql
    raise AttributeError(name)


__all__ = [
    "get_spark",
    "open_catalog",
    "DeltaStore",
    "ReadNodeStore",
    "checkpoint",
    "restore_store",
    "remote_compact",
    "run_sql",
]
__version__ = "0.1.0"

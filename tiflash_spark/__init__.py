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

__all__ = ["get_spark"]
__version__ = "0.1.0"

"""Operator builders — each SURVEY.md §2.1 executor re-expressed Spark-first.

Every module exposes ``QUERIES: dict[str, Callable[(SparkSession, str), DataFrame]]``
and ``ORACLE: dict[str, str]`` (DuckDB-ANSI SQL over the same parquet views) so
the driver's correctness gate can hash-compare them. Queries without an exact
SQL oracle (approximate sketches, hash-dependent ops) appear only in QUERIES.
"""

"""Admin-SQL surface: `ALTER TABLE <t> COMPACT [TIFLASH REPLICA]` routed
onto DeltaStore maintenance (reference design doc
docs/design/2022-05-12 ... 2022-05-19-compact-table-via-sql.md: TiDB
parses the statement and drives TiFlash's Segment compaction through a
service call; here the statement drives DeltaStore.compact directly).

Everything that is not an admin statement passes through to spark.sql
untouched, so a session opened with open_catalog + as_view can be driven
entirely through one `run_sql` entry point — query and maintenance both,
the way a reference user drives TiDB."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.sources.delta_store import VERSION, DeltaStore

__all__ = ["run_sql"]

_COMPACT = re.compile(
    r"^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+COMPACT(?P<part>\s+PARTITION)?"
    r"(?:\s+TIFLASH\s+REPLICA)?\s*;?\s*$",
    re.IGNORECASE,
)

# MySQL's `LIMIT offset, count` tail — Spark only accepts
# `LIMIT count OFFSET offset`. Matched at statement tail only (outside
# any subquery a trailing-limit rewrite could corrupt); other MySQL-isms
# (backticks, != , DIV-named functions) are already Spark-native or
# covered by functions/sql_registry.
_MYSQL_LIMIT = re.compile(r"\bLIMIT\s+(\d+)\s*,\s*(\d+)\s*;?\s*$", re.IGNORECASE)

# Online DDL statements routed onto the store's schema registry
# (reference: TiDB parses ALTER TABLE and ships a SchemaUpdate that
# SchemaBuilder.cpp applies — add/drop are metadata-only, modify is
# restricted to lossless widenings, exactly DeltaStore's contract).
_TRUNCATE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?`?(\w+)`?\s*;?\s*$", re.IGNORECASE
)

_RENAME_COL = re.compile(
    r"^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+RENAME\s+COLUMN\s+"
    r"`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*$",
    re.IGNORECASE,
)

_ALTER_COL = re.compile(
    r"^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+"
    r"(ADD|DROP|MODIFY)\s+COLUMN\s+`?(\w+)`?"
    r"(?:\s+([A-Za-z0-9_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?))?"
    r"(?:\s+(?P<notnull>NOT\s+NULL)|\s+(?P<plainnull>NULL))?"
    r"(?:\s+DEFAULT\s+(?P<dflt>'[^']*'|[^\s;]+))?"
    r"(?:\s+AS\s+\((?P<gen>.+)\)\s+VIRTUAL)?\s*;?\s*$",
    re.IGNORECASE,
)


# EXPLAIN [ANALYZE] <query> — TiDB's statement surface; TiFlash feeds it
# the per-executor ExecutionSummary rows (Flash/Statistics/
# ExecutionSummaryHelper.cpp). EXPLAIN returns the formatted physical
# plan as rows; EXPLAIN ANALYZE executes and returns per-operator
# SQLMetrics, the engine's execution-profile surface.
_EXPLAIN = re.compile(
    r"^\s*EXPLAIN(?P<analyze>\s+ANALYZE)?\s+(?P<query>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# Index DDL, the reference's SQL forms (tests/fullstack-test-index/):
#   ALTER TABLE t ADD FULLTEXT INDEX idx (col)
#   ALTER TABLE t ADD COLUMNAR INDEX idx (col) USING INVERTED
#   ALTER TABLE t ADD VECTOR INDEX idx ((VEC_COSINE_DISTANCE(col))) USING HNSW
#   ALTER TABLE t ADD VECTOR INDEX idx ((VEC_L2_DISTANCE(col))) USING HNSW
_ADD_INDEX = re.compile(
    r"^\s*ALTER\s+TABLE\s+`?(?P<tbl>\w+)`?\s+ADD\s+"
    r"(?:(?P<fts>FULLTEXT)|(?P<col_idx>COLUMNAR)|(?P<vec>VECTOR))\s+INDEX\s+"
    r"`?(?P<idx>\w+)`?\s*\(\s*"
    r"(?:\(\s*VEC_(?:COSINE_DISTANCE|L2_DISTANCE)\s*\(\s*`?(?P<veccol>\w+)`?\s*\)\s*\)"
    r"|`?(?P<col>\w+)`?)\s*\)"
    r"(?:\s+USING\s+(?P<algo>\w+))?\s*;?\s*$",
    re.IGNORECASE,
)


def run_sql(
    spark: SparkSession, sql: str, stores: dict[str, DeltaStore] | None = None
) -> DataFrame:
    """Execute ``sql``; admin statements are intercepted, everything else
    is plain spark.sql. `ALTER TABLE t COMPACT` compacts the registered
    store at its newest committed version (the statement's contract: all
    current delta folded; later writes keep MVCC semantics), re-registers
    the table view (as_view snapshots are plan-time), and returns a
    one-row result the way TiDB returns an OK packet with info."""
    m = _EXPLAIN.match(sql)
    if m:
        from tiflash_spark.plans.explain import execution_profile, formatted_plan

        inner = _MYSQL_LIMIT.sub(
            lambda mm: f"LIMIT {mm.group(2)} OFFSET {mm.group(1)}",
            m.group("query"),
        )
        df = spark.sql(inner)
        if m.group("analyze"):
            rows = [
                (i, p["node"], k, int(v))
                for i, p in enumerate(execution_profile(df))
                for k, v in sorted(p["metrics"].items())
            ]
            return spark.createDataFrame(
                rows or [(0, "(no metrics)", "", 0)],
                "op_index int, operator string, metric string, value long",
            )
        lines = formatted_plan(df).splitlines()
        return spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(lines)], "line int, plan string"
        )
    m = _COMPACT.match(sql)
    if m:
        name = m.group(1)
        if not stores or name not in stores:
            raise ValueError(
                f"ALTER TABLE {name} COMPACT: no DeltaStore registered "
                f"under {name!r} (known: {sorted(stores or {})})"
            )
        store = stores[name]
        top = store.log().agg(F.max(VERSION).alias("v")).collect()[0].v
        ts = int(top) if top is not None else 0
        if m.group("part"):
            # COMPACT PARTITION: the reference compacts one partition of a
            # partitioned table; the segment analogue is the incremental
            # per-segment delta merge — only segments whose delta tail has
            # rows are rewritten, cold segments' files are untouched
            rewritten, total = store.compact_segments_incremental(ts=ts)
            store.as_view(name)
            return spark.createDataFrame(
                [(name, ts, int(rewritten), int(total))],
                "table_name string, safe_point long,"
                " segments_rewritten long, segments_total long",
            )
        kept = store.compact(ts=ts) if top is not None else 0
        store.as_view(name)
        return spark.createDataFrame(
            [(name, ts, int(kept))],
            "table_name string, safe_point long, rows_kept long",
        )
    m = _ADD_INDEX.match(sql)
    if m:
        name = m.group("tbl")
        if not stores or name not in stores:
            raise ValueError(
                f"ALTER TABLE {name} ADD ... INDEX: no DeltaStore registered "
                f"under {name!r} (known: {sorted(stores or {})})"
            )
        store = stores[name]
        algo = (m.group("algo") or "").upper()
        if m.group("fts"):
            kind, col = "fulltext", m.group("col")
            segs = store.build_fulltext_index(col)
        elif m.group("col_idx"):
            if algo and algo != "INVERTED":
                raise ValueError(f"COLUMNAR INDEX supports USING INVERTED, not {algo}")
            kind, col = "inverted", m.group("col")
            segs = store.build_inverted_index([col])
        else:
            # VECTOR INDEX ((VEC_*_DISTANCE(col))) USING HNSW — the
            # Spark-native index is the IVF posting sidecar; HNSW is the
            # reference's algorithm name, accepted as the DDL spelling
            kind, col = "vector", m.group("veccol")
            if col is None:
                raise ValueError(
                    "VECTOR INDEX needs ((VEC_COSINE_DISTANCE(col))) or "
                    "((VEC_L2_DISTANCE(col)))"
                )
            segs = store.build_vector_index(col)
        return spark.createDataFrame(
            [(name, m.group("idx"), kind, col, int(segs))],
            "table_name string, index_name string, index_kind string,"
            " column_name string, segments_covered long",
        )
    m = _TRUNCATE.match(sql)
    if m:
        name = m.group(1)
        if not stores or name not in stores:
            raise ValueError(
                f"TRUNCATE TABLE {name}: no DeltaStore registered under "
                f"{name!r} (known: {sorted(stores or {})})"
            )
        store = stores[name]
        store.truncate_table()
        store.as_view(name)
        return spark.createDataFrame(
            [(name, "truncate")], "table_name string, op string"
        )
    m = _RENAME_COL.match(sql)
    if m:
        name, old, new = m.group(1), m.group(2), m.group(3)
        if not stores or name not in stores:
            raise ValueError(
                f"ALTER TABLE {name} RENAME COLUMN: no DeltaStore registered "
                f"under {name!r} (known: {sorted(stores or {})})"
            )
        store = stores[name]
        v = store.rename_column(old, new)
        store.as_view(name)
        return spark.createDataFrame(
            [(name, old, new, int(v))],
            "table_name string, old_name string, new_name string, schema_version long",
        )
    m = _ALTER_COL.match(sql)
    if m:
        name, verb, col, dtype = (
            m.group(1), m.group(2).upper(), m.group(3), m.group(4),
        )
        if not stores or name not in stores:
            raise ValueError(
                f"ALTER TABLE {name}: no DeltaStore registered under "
                f"{name!r} (known: {sorted(stores or {})})"
            )
        store = stores[name]
        if verb == "ADD":
            if not dtype:
                raise ValueError(f"ADD COLUMN {col}: missing type")
            if m.group("gen"):
                # `ADD COLUMN c t AS (expr) VIRTUAL` — TiDB's virtual
                # generated column, computed at read, never stored
                v = store.add_generated_column(
                    col, dtype.lower().replace(" ", ""), m.group("gen")
                )
            else:
                dflt = m.group("dflt")
                if dflt is not None:
                    dflt = dflt.strip("'")
                v = store.add_column(
                    col, dtype.lower().replace(" ", ""), default=dflt
                )
        elif verb == "MODIFY":
            if not dtype:
                raise ValueError(f"MODIFY COLUMN {col}: missing type")
            ty = dtype.lower().replace(" ", "")
            cur = dict(store.current_fields() or [])
            if m.group("notnull") or m.group("plainnull"):
                # nullability change: metadata-only when the type is
                # unchanged (alter_column_nullable.test), else widen first
                if cur.get(col) != ty:
                    store.modify_column(col, ty)
                v = store.set_column_nullable(col, bool(m.group("plainnull")))
            else:
                v = store.modify_column(col, ty)
        else:
            v = store.drop_column(col)
        store.as_view(name)
        return spark.createDataFrame(
            [(name, col, verb.lower(), int(v))],
            "table_name string, column_name string, op string, schema_version long",
        )
    sql = _MYSQL_LIMIT.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)
    return spark.sql(sql)

"""Property-based SQL-DML testing: random statement sequences
(INSERT / REPLACE / UPDATE / DELETE / COMPACT / TRUNCATE) through
run_sql must always agree with a trivial in-memory dict model — the
MVCC journal, version allocation, auto-rowid allocation, WHERE binding,
and pre-update-row SET semantics all under one roof.

Kept deliberately small (examples × ops): every statement is a real
Spark job; the value is the random INTERLEAVING."""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiflash_spark.sources.admin_sql import run_sql
from tiflash_spark.sources.delta_store import DeltaStore

_counter = itertools.count()

KEYS = st.integers(min_value=0, max_value=7)
VALS = st.integers(min_value=-5, max_value=5)


@st.composite
def stmt_sequences(draw):
    n = draw(st.integers(min_value=4, max_value=8))
    ops = []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["insert", "replace", "update", "delete", "compact", "truncate"]
            )
        )
        if kind in ("insert", "replace"):
            pairs = draw(
                st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=3,
                         unique_by=lambda p: p[0])
            )
            ops.append((kind, pairs))
        elif kind == "update":
            ops.append((kind, draw(VALS), draw(VALS)))  # threshold, delta
        elif kind == "delete":
            ops.append((kind, draw(VALS)))  # threshold
        else:
            ops.append((kind,))
    return ops


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=stmt_sequences())
def test_random_dml_sequences_match_model(spark, tmp_path, ops):
    stores: dict = {}
    name = f"dml{next(_counter)}"
    run_sql(
        spark,
        f"CREATE TABLE {name}(k BIGINT NOT NULL, v BIGINT, "
        "PRIMARY KEY CLUSTERED (k))",
        stores,
        base_path=str(tmp_path),
    )
    store = stores[name]
    model: dict[int, int] = {}
    for op in ops:
        kind = op[0]
        if kind in ("insert", "replace"):
            pairs = op[1]
            vals = ", ".join(f"({k}, {v})" for k, v in pairs)
            # the store is an upsert journal: INSERT == REPLACE == put
            run_sql(spark, f"INSERT INTO {name} VALUES {vals}", stores)
            model.update(dict(pairs))
        elif kind == "update":
            thr, delta = op[1], op[2]
            r = run_sql(
                spark, f"UPDATE {name} SET v = v + {delta} WHERE v >= {thr}",
                stores,
            ).collect()[0]
            touched = {k for k, v in model.items() if v is not None and v >= thr}
            assert r.rows_affected == len(touched)
            for k in touched:
                model[k] += delta
        elif kind == "delete":
            thr = op[1]
            r = run_sql(
                spark, f"DELETE FROM {name} WHERE v < {thr}", stores
            ).collect()[0]
            doomed = {k for k, v in model.items() if v is not None and v < thr}
            assert r.rows_affected == len(doomed)
            for k in doomed:
                del model[k]
        elif kind == "compact":
            if store.newest_version() > 0:
                run_sql(spark, f"ALTER TABLE {name} COMPACT", stores)
        else:
            run_sql(spark, f"TRUNCATE TABLE {name}", stores)
            model.clear()
        got = {r.k: r.v for r in run_sql(spark, f"SELECT * FROM {name}").collect()}
        assert got == model, (op, got, model)


@st.composite
def ddl_dml_sequences(draw):
    n = draw(st.integers(min_value=4, max_value=7))
    ops = []
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["insert", "update", "delete", "add", "add_default",
                 "rename", "drop", "compact", "truncate"]
            )
        )
        if kind == "insert":
            ops.append((kind,
                        draw(st.lists(st.tuples(KEYS, VALS), min_size=1,
                                      max_size=3, unique_by=lambda p: p[0])),
                        draw(st.booleans())))  # supply-extra-columns flag
        elif kind == "update":
            ops.append((kind, draw(VALS), draw(st.one_of(VALS, st.none()))))
        elif kind == "delete":
            ops.append((kind, draw(VALS)))
        elif kind == "add_default":
            ops.append((kind, draw(VALS)))
        else:
            ops.append((kind,))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=ddl_dml_sequences())
def test_ddl_dml_interleavings_match_model(spark, tmp_path, ops):
    """Online DDL (ADD [DEFAULT] / RENAME / DROP COLUMN) interleaved
    with SQL DML and compaction/truncation: the visible table always
    equals a dict model applying the read-time rules (pre-ADD rows
    surface the default; explicit NULLs stay NULL; renames are
    metadata-only; drops prune everywhere)."""
    stores: dict = {}
    name = f"dd{next(_counter)}"
    run_sql(
        spark,
        f"CREATE TABLE {name}(k BIGINT NOT NULL, v BIGINT, "
        "PRIMARY KEY CLUSTERED (k))",
        stores,
        base_path=str(tmp_path),
    )
    store = stores[name]
    cols = ["v"]            # visible non-pk columns, schema order
    defaults: dict = {}     # col -> write default
    rows: dict = {}         # k -> {col: val}
    n_added = 0
    for op in ops:
        kind = op[0]
        if kind == "insert":
            pairs, extra = op[1], op[2]
            # explicit column list: k + v (+ every later column when
            # extra is set); omitted columns take write-default/NULL
            supplied = ["k"] + (cols if extra else ["v"] if "v" in cols else [])
            vals = ", ".join(
                "(" + ", ".join([str(k)] + [str(v) for _ in supplied[1:]]) + ")"
                for k, v in pairs
            )
            run_sql(spark, f"INSERT INTO {name} ({', '.join(supplied)}) "
                    f"VALUES {vals}", stores)
            for k, v in pairs:
                row = {c: defaults.get(c) for c in cols}
                for c in supplied[1:]:
                    row[c] = v
                rows[k] = row
        elif kind == "update":
            thr, newv = op[1], op[2]
            tgt = cols[0]
            lit = "NULL" if newv is None else str(newv)
            run_sql(spark, f"UPDATE {name} SET {tgt} = {lit} "
                    f"WHERE k >= {thr}", stores)
            for k in rows:
                if k >= thr:
                    rows[k][tgt] = newv
        elif kind == "delete":
            thr = op[1]
            run_sql(spark, f"DELETE FROM {name} WHERE k < {thr}", stores)
            rows = {k: r for k, r in rows.items() if k >= thr}
        elif kind in ("add", "add_default"):
            n_added += 1
            c = f"c{n_added}"
            if kind == "add_default":
                d = op[1]
                run_sql(spark, f"ALTER TABLE {name} ADD COLUMN {c} BIGINT "
                        f"DEFAULT {d}", stores)
                defaults[c] = d
                fill = d  # pre-ADD rows surface the default
            else:
                run_sql(spark, f"ALTER TABLE {name} ADD COLUMN {c} BIGINT",
                        stores)
                fill = None
            cols.append(c)
            for r in rows.values():
                r[c] = fill
        elif kind == "rename":
            n_added += 1
            old, new = cols[0], f"r{n_added}"
            run_sql(spark, f"ALTER TABLE {name} RENAME COLUMN {old} TO {new}",
                    stores)
            cols[0] = new
            if old in defaults:
                defaults[new] = defaults.pop(old)
            for r in rows.values():
                r[new] = r.pop(old)
        elif kind == "drop":
            if len(cols) < 2:
                continue  # keep at least one payload column
            c = cols.pop()
            run_sql(spark, f"ALTER TABLE {name} DROP COLUMN {c}", stores)
            defaults.pop(c, None)
            for r in rows.values():
                r.pop(c, None)
        elif kind == "compact":
            if store.newest_version() > 0:
                run_sql(spark, f"ALTER TABLE {name} COMPACT", stores)
        else:
            run_sql(spark, f"TRUNCATE TABLE {name}", stores)
            rows = {}
        got = {
            r["k"]: {c: r[c] for c in cols}
            for r in (x.asDict() for x in
                      run_sql(spark, f"SELECT * FROM {name}").collect())
        }
        assert got == rows, (op, got, rows)

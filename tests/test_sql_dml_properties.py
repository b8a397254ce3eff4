"""Property-based SQL-DML testing: random statement sequences
(INSERT / REPLACE / UPDATE / DELETE / COMPACT / TRUNCATE) through
run_sql must always agree with a trivial in-memory dict model — the
MVCC journal, version allocation, auto-rowid allocation, WHERE binding,
and pre-update-row SET semantics all under one roof.

Kept deliberately small (examples × ops): every statement is a real
Spark job; the value is the random INTERLEAVING."""

from __future__ import annotations

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

"""Property-based MVCC store testing (beyond the reference — SURVEY §5
notes it has none): random op sequences (delta upserts/deletes, bulk
ingests, compactions at random safe-points, segment reshapes) must always
agree with a trivial in-memory model of newest-version-wins semantics.

Kept deliberately small (examples × ops) — every op is a real Spark
job; the value is the random INTERLEAVING, which directed tests can't
cover."""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore

_counter = itertools.count()

HANDLES = st.integers(min_value=0, max_value=9)


@st.composite
def op_sequences(draw):
    n_ops = draw(st.integers(min_value=3, max_value=7))
    ops, version = [], 0
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(["write", "delete", "ingest", "compact"]))
        if kind in ("write", "ingest"):
            hs = draw(st.lists(HANDLES, min_size=1, max_size=4, unique=True))
            ops.append((kind, version, hs))
        elif kind == "delete":
            hs = draw(st.lists(HANDLES, min_size=1, max_size=2, unique=True))
            ops.append((kind, version, hs))
        else:
            ops.append(
                ("compact", version,
                 draw(st.sampled_from(["flat", "hash", "range"])))
            )
    return ops


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=op_sequences())
def test_random_op_sequences_match_model(spark, tmp_path, ops):
    store = DeltaStore(spark, str(tmp_path / f"s{next(_counter)}"))
    model: dict[int, tuple[int, str | None]] = {}  # handle -> (version, value|None=deleted)
    wrote = False
    for kind, version, arg in ops:
        if kind in ("write", "ingest", "delete"):
            hs = arg
            rows = [(h, f"{kind}{version}h{h}") for h in hs]
            df = spark.createDataFrame(rows, f"{HANDLE} long, v string")
            if kind == "write":
                store.write_batch(df, version=version)
                for h, v in rows:
                    model[h] = (version, v)
            elif kind == "ingest":
                store.ingest_snapshot(df, version=version)
                for h, v in rows:
                    model[h] = (version, v)
            else:
                store.write_batch(df, version=version, delete=True)
                for h, _ in rows:
                    model[h] = (version, None)
            wrote = True
        else:
            if not wrote:
                continue  # compacting an empty store is a separate unit test
            if arg == "hash":
                store.compact(ts=version, num_segments=3)
            elif arg == "range":
                store.compact_range_segments(ts=version, num_segments=2)
            else:
                store.compact(ts=version)
        live = {h: v for h, (_, v) in model.items() if v is not None}
        got = {r[HANDLE]: r.v for r in store.read().collect()}
        assert got == live, f"after {kind}@{version}: {got} != {live}"
    # point and range reads agree with the final model too
    if model:
        some = sorted(model)[:3]
        live = {h: model[h][1] for h in some if model[h][1] is not None}
        got = {r[HANDLE]: r.v for r in store.read_handles(some).collect()}
        assert got == live
        live_rng = {
            h: v for h, (_, v) in model.items() if v is not None and 2 <= h < 8
        }
        got_rng = {r[HANDLE]: r.v for r in store.read_range(2, 8).collect()}
        assert got_rng == live_rng
        # late-materialized value probe agrees with the model too
        vals = sorted({v for _, v in model.values() if v is not None})[:2]
        if vals:
            got_lm = {r[HANDLE]: r.v for r in store.read_late("v", values=vals).collect()}
            live_lm = {h: v for h, (_, v) in model.items() if v in vals}
            assert got_lm == live_lm


@st.composite
def ddl_op_sequences(draw):
    """Op sequences that interleave online DDL (add/drop of one extra
    column) with writes, ingests, and compactions."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version, has_x, added_ever = [], 0, False, False
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(
            ["write", "ingest", "compact", "addcol", "dropcol"]
        ))
        if kind in ("write", "ingest"):
            hs = draw(st.lists(HANDLES, min_size=1, max_size=3, unique=True))
            ops.append((kind, version, hs))
        elif kind == "addcol":
            # at most one add per sequence: re-adding a dropped column
            # resurfaces old file values (documented same-type-re-add
            # behavior), which the flat model here doesn't track
            if has_x or added_ever:
                continue
            has_x = added_ever = True
            ops.append(("addcol", version, None))
        elif kind == "dropcol":
            if not has_x:
                continue
            has_x = False
            ops.append(("dropcol", version, None))
        else:
            ops.append(("compact", version,
                        draw(st.sampled_from(["flat", "hash"]))))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=ddl_op_sequences())
def test_random_ddl_interleavings_match_model(spark, tmp_path, ops):
    """Online DDL between writes/ingests/compactions: reads must always
    reflect the CURRENT schema (added column NULL for pre-DDL rows,
    dropped column pruned), at any interleaving."""
    store = DeltaStore(spark, str(tmp_path / f"d{next(_counter)}"))
    # bootstrap one row so the schema manifest can snapshot v1
    store.write_batch(
        spark.createDataFrame([(99, "seed")], f"{HANDLE} long, v string"),
        version=1,
    )
    model: dict[int, dict] = {99: {"v": "seed", "x": None}}
    has_x, wrote = False, True
    for kind, version, arg in ops:
        version += 1  # leave room for the seed write at v1
        if kind in ("write", "ingest"):
            if has_x:
                rows = [(h, f"w{version}h{h}", version * 10 + h) for h in arg]
                df = spark.createDataFrame(
                    rows, f"{HANDLE} long, v string, x int"
                )
                for h, v, x in rows:
                    model[h] = {"v": v, "x": x}
            else:
                rows = [(h, f"w{version}h{h}") for h in arg]
                df = spark.createDataFrame(rows, f"{HANDLE} long, v string")
                for h, v in rows:
                    model[h] = {"v": v, "x": None}
            if kind == "write":
                store.write_batch(df, version=version)
            else:
                store.ingest_snapshot(df, version=version)
        elif kind == "addcol":
            store.add_column("x", "int")
            has_x = True
            for st_row in model.values():
                st_row["x"] = None  # pre-DDL rows read as NULL
        elif kind == "dropcol":
            store.drop_column("x")
            has_x = False
        else:
            if arg == "hash":
                store.compact(ts=version, num_segments=2)
            else:
                store.compact(ts=version)
        rows_now = store.read().collect()
        got_v = {r[HANDLE]: r.v for r in rows_now}
        assert got_v == {h: m["v"] for h, m in model.items()}, (kind, version)
        if has_x:
            got_x = {r[HANDLE]: r.x for r in rows_now}
            assert got_x == {h: m["x"] for h, m in model.items()}, (kind, version)
        else:
            assert all("x" not in r.asDict() for r in rows_now), (kind, version)


# --- disaggregated ops interleaved with local mutations ----------------------


@st.composite
def disagg_op_sequences(draw):
    """Local writes/deletes/compactions interleaved with checkpoint
    uploads, remote compactions + adoption attempts, and read-node
    verification against the model."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version = [], 0
    for _ in range(n_ops):
        version += 1
        kind = draw(
            st.sampled_from(
                ["write", "delete", "compact", "checkpoint", "remote_compact"]
            )
        )
        if kind in ("write", "delete"):
            hs = draw(st.lists(HANDLES, min_size=1, max_size=3, unique=True))
            ops.append((kind, version, hs))
        else:
            ops.append((kind, version, None))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=disagg_op_sequences())
def test_random_disagg_interleavings_match_model(spark, tmp_path, ops):
    from tiflash_spark.sources import remote_store as rs
    from tiflash_spark.sources.remote_store import ReadNodeStore

    run = next(_counter)
    store = DeltaStore(spark, str(tmp_path / f"d{run}"))
    remote = str(tmp_path / f"r{run}")
    model: dict[int, tuple[int, str | None]] = {}
    ckpt_model: dict[int, str] | None = None  # live rows at last checkpoint
    wrote = False
    n_scratch = itertools.count()
    for kind, version, arg in ops:
        if kind in ("write", "delete"):
            rows = [(h, f"{kind}{version}h{h}") for h in arg]
            df = spark.createDataFrame(rows, f"{HANDLE} long, v string")
            store.write_batch(df, version=version, delete=(kind == "delete"))
            for h, v in rows:
                model[h] = (version, None if kind == "delete" else v)
            wrote = True
        elif kind == "compact":
            if wrote:
                store.compact(ts=version, num_segments=2)
        elif kind == "checkpoint":
            if not wrote:
                continue
            rs.checkpoint(store, remote, store_id="p")
            ckpt_model = {h: v for h, (_, v) in model.items() if v is not None}
        else:  # remote_compact + adoption attempt
            if ckpt_model is None:
                continue
            rs.remote_compact(
                spark, remote, "p", ts=version,
                work_dir=str(tmp_path / f"w{run}_{next(n_scratch)}"),
            )
            try:
                rs.adopt_remote_compaction(store, remote, "p")
            except ValueError:
                pass  # local swap since upload — refusing is the contract
        if not wrote:
            continue  # nothing ingested yet: empty-store read is a unit test
        live = {h: v for h, (_, v) in model.items() if v is not None}
        got = {r[HANDLE]: r.v for r in store.read().collect()}
        assert got == live, f"after {kind}@{version}: {got} != {live}"
        if ckpt_model is not None:
            rn = ReadNodeStore(spark, remote, store_id="p")
            got_rn = {r[HANDLE]: r.v for r in rn.read().collect()}
            assert got_rn == ckpt_model, (
                f"read node after {kind}@{version}: {got_rn} != {ckpt_model}"
            )


@st.composite
def widen_gen_op_sequences(draw):
    """Interleavings of writes, compactions, ONE lossless MODIFY (int ->
    bigint) and ONE virtual generated column add/drop."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version, widened, has_gen, gen_ever = [], 0, False, False, False
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(
            ["write", "write", "compact", "modify", "addgen", "dropgen"]
        ))
        if kind == "write":
            hs = draw(st.lists(HANDLES, min_size=1, max_size=3, unique=True))
            ops.append(("write", version, hs))
        elif kind == "modify":
            if widened:
                continue
            widened = True
            ops.append(("modify", version, None))
        elif kind == "addgen":
            if has_gen or gen_ever:
                continue
            has_gen = gen_ever = True
            ops.append(("addgen", version, None))
        elif kind == "dropgen":
            if not has_gen:
                continue
            has_gen = False
            ops.append(("dropgen", version, None))
        else:
            ops.append(("compact", version,
                        draw(st.sampled_from(["flat", "range"]))))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=widen_gen_op_sequences())
def test_modify_and_generated_interleavings_match_model(spark, tmp_path, ops):
    """MODIFY COLUMN widening and a virtual generated column interleaved
    with writes/compactions: values survive the widened reads bit-exact,
    the generated column always equals its expression over CURRENT
    values, and it never reaches the stored files."""
    store = DeltaStore(spark, str(tmp_path / f"wg{next(_counter)}"))
    store.write_batch(
        spark.createDataFrame([(99, 7)], f"{HANDLE} long, n int"), version=1
    )
    model: dict[int, int] = {99: 7}
    widened, has_gen = False, False
    for kind, version, arg in ops:
        version += 1
        if kind == "write":
            rows = [(h, version * 100 + h) for h in arg]
            dtype = "bigint" if widened else "int"
            store.write_batch(
                spark.createDataFrame(rows, f"{HANDLE} long, n {dtype}"),
                version=version,
            )
            model.update(rows)
        elif kind == "modify":
            store.modify_column("n", "bigint")
            widened = True
        elif kind == "addgen":
            store.add_generated_column("g", "bigint", "n * 2")
            has_gen = True
        elif kind == "dropgen":
            store.drop_column("g")
            has_gen = False
        elif arg == "range":
            store.compact_range_segments(ts=version, num_segments=2)
        else:
            store.compact(ts=version)
        rows = store.read().collect()
        got_n = {r[HANDLE]: r.n for r in rows}
        assert got_n == model, (kind, version)
        if has_gen:
            assert {r[HANDLE]: r.g for r in rows} == {
                h: n * 2 for h, n in model.items()
            }
            assert "g" not in store.log().columns
        else:
            assert "g" not in store.read().columns


@st.composite
def fts_op_sequences(draw):
    """Interleavings of text writes/deletes, compactions, and ONE
    full-text index build at a random point."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version, built = [], 0, False
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(
            ["write", "write", "delete", "compact", "buildfts"]
        ))
        if kind in ("write", "delete"):
            hs = draw(st.lists(
                HANDLES, min_size=1, max_size=3 if kind == "write" else 2,
                unique=True,
            ))
            words = draw(st.lists(
                st.sampled_from(["apple", "banana", "cherry"]),
                min_size=1, max_size=2, unique=True,
            )) if kind == "write" else None
            ops.append((kind, version, (hs, words)))
        elif kind == "buildfts":
            if built:
                continue
            built = True
            ops.append(("buildfts", version, None))
        else:
            ops.append(("compact", version,
                        draw(st.sampled_from(["hash", "range"]))))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=fts_op_sequences())
def test_fts_interleavings_match_model(spark, tmp_path, ops):
    """fts_match_word must equal the model's exact word membership after
    EVERY op — index built mid-history, refreshed by compactions, delta
    writes and deletes winning over stale postings."""
    store = DeltaStore(spark, str(tmp_path / f"fp{next(_counter)}"))
    store.write_batch(
        spark.createDataFrame(
            [(99, "apple banana")], f"{HANDLE} long, body string"
        ),
        version=1,
    )
    model: dict[int, str | None] = {99: "apple banana"}
    compacted = False
    for kind, version, arg in ops:
        version += 1
        if kind == "write":
            hs, words = arg
            rows = [(h, " ".join(words) + f" w{version}") for h in hs]
            store.write_batch(
                spark.createDataFrame(rows, f"{HANDLE} long, body string"),
                version=version,
            )
            model.update(rows)
        elif kind == "delete":
            hs, _ = arg
            rows = [(h, "x") for h in hs]
            store.write_batch(
                spark.createDataFrame(rows, f"{HANDLE} long, body string"),
                version=version,
                delete=True,
            )
            for h, _ in rows:
                model[h] = None
        elif kind == "buildfts":
            if not compacted:
                store.compact(ts=version, num_segments=2)
                compacted = True
            store.build_fulltext_index("body")
        elif arg == "range":
            store.compact_range_segments(ts=version, num_segments=2)
            compacted = True
        else:
            store.compact(ts=version, num_segments=2)
            compacted = True
        for word in ("apple", "banana", "cherry"):
            want = sorted(
                h for h, body in model.items()
                if body is not None and word in body.split()
            )
            got = sorted(
                r[HANDLE] for r in store.fts_match_word("body", word).collect()
            )
            assert got == want, (kind, version, word, got, want)


@st.composite
def rename_op_sequences(draw):
    """Interleavings of writes, compactions, and RENAMEs of the value
    column through a 3-name cycle (v -> v2 -> v3)."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version, name_idx = [], 0, 0
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(["write", "write", "compact", "rename"]))
        if kind == "write":
            hs = draw(st.lists(HANDLES, min_size=1, max_size=3, unique=True))
            ops.append(("write", version, hs))
        elif kind == "rename":
            if name_idx >= 2:
                continue
            name_idx += 1
            ops.append(("rename", version, name_idx))
        else:
            ops.append(("compact", version,
                        draw(st.sampled_from(["flat", "hash"]))))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=rename_op_sequences())
def test_rename_interleavings_match_model(spark, tmp_path, ops):
    """RENAME COLUMN at random points in a write/compact history: reads
    always carry every row's value under the CURRENT name, whichever
    name the row's file was written under."""
    names = ["v", "v2", "v3"]
    store = DeltaStore(spark, str(tmp_path / f"rn{next(_counter)}"))
    store.write_batch(
        spark.createDataFrame([(99, "seed")], f"{HANDLE} long, v string"),
        version=1,
    )
    model: dict[int, str] = {99: "seed"}
    cur = 0
    for kind, version, arg in ops:
        version += 1
        if kind == "write":
            rows = [(h, f"w{version}h{h}") for h in arg]
            store.write_batch(
                spark.createDataFrame(
                    rows, f"{HANDLE} long, {names[cur]} string"
                ),
                version=version,
            )
            model.update(rows)
        elif kind == "rename":
            store.rename_column(names[cur], names[arg])
            cur = arg
        elif arg == "hash":
            store.compact(ts=version, num_segments=2)
        else:
            store.compact(ts=version)
        got = {r[HANDLE]: r[names[cur]] for r in store.read().collect()}
        assert got == model, (kind, version, names[cur])
        assert set(store.read().columns) == {HANDLE, names[cur]}


@st.composite
def default_op_sequences(draw):
    """Interleavings of writes (sometimes omitting the defaulted column,
    sometimes writing explicit NULL), ONE ADD-with-default at a random
    point, optional SET DEFAULT later, and compactions."""
    n_ops = draw(st.integers(min_value=4, max_value=8))
    ops, version, added, reset = [], 0, False, False
    for _ in range(n_ops):
        version += 1
        kind = draw(st.sampled_from(
            ["write", "write", "compact", "adddef", "setdef"]
        ))
        if kind == "write":
            hs = draw(st.lists(HANDLES, min_size=1, max_size=3, unique=True))
            mode = draw(st.sampled_from(["omit", "value", "null"]))
            ops.append(("write", version, (hs, mode)))
        elif kind == "adddef":
            if added:
                continue
            added = True
            ops.append(("adddef", version, None))
        elif kind == "setdef":
            if not added or reset:
                continue
            reset = True
            ops.append(("setdef", version, None))
        else:
            ops.append(("compact", version,
                        draw(st.sampled_from(["flat", "hash"]))))
    return ops


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=default_op_sequences())
def test_default_interleavings_match_model(spark, tmp_path, ops):
    """ADD COLUMN ... DEFAULT at a random history point: rows written
    before the DDL read the ADD-time default, omitted columns after it
    materialize the CURRENT write default, explicit NULLs stay NULL —
    at every interleaving with compactions and a SET DEFAULT."""
    store = DeltaStore(spark, str(tmp_path / f"dd{next(_counter)}"))
    store.write_batch(
        spark.createDataFrame([(99, "seed")], f"{HANDLE} long, v string"),
        version=1,
    )
    model: dict[int, object] = {99: "PRE"}  # PRE = pre-DDL sentinel
    added = False
    fill_default, write_default = None, None
    for kind, version, arg in ops:
        version += 1
        if kind == "write":
            hs, mode = arg
            if not added or mode == "omit":
                rows = [(h, f"w{version}") for h in hs]
                store.write_batch(
                    spark.createDataFrame(rows, f"{HANDLE} long, v string"),
                    version=version,
                )
                for h, _ in rows:
                    model[h] = "PRE" if not added else write_default
            elif mode == "null":
                rows = [(h, f"w{version}", None) for h in hs]
                store.write_batch(
                    spark.createDataFrame(
                        rows, f"{HANDLE} long, v string, d int"
                    ),
                    version=version,
                )
                for h, _, _ in rows:
                    model[h] = None
            else:
                rows = [(h, f"w{version}", version * 10 + h) for h in hs]
                store.write_batch(
                    spark.createDataFrame(
                        rows, f"{HANDLE} long, v string, d int"
                    ),
                    version=version,
                )
                for h, _, x in rows:
                    model[h] = x
        elif kind == "adddef":
            store.add_column("d", "int", default="77")
            added, fill_default, write_default = True, 77, 77
        elif kind == "setdef":
            store.set_column_default("d", "88")
            write_default = 88
        elif arg == "hash":
            store.compact(ts=version, num_segments=2)
        else:
            store.compact(ts=version)
        if added:
            want = {
                h: (fill_default if m == "PRE" else m) for h, m in model.items()
            }
            got = {r[HANDLE]: r.d for r in store.read().collect()}
            assert got == want, (kind, version, got, want)

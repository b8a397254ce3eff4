"""DDL × indexed/late-materialized read paths: read_where_null and
read_late/read_late_conj must bind predicates to VISIBLE values after
RENAME COLUMN, ADD COLUMN ... DEFAULT, and generated columns — the
conform-before-filter contract read_where/read_where_in already carry
(reference: the storage layer always reconciles DMFile column ids to the
CURRENT schema before filter pushdown, SchemaUpdate.cpp; stale-byte index
results are rough, never authoritative — RSResult semantics)."""

from __future__ import annotations

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore


def _store(spark, tmp_path, name):
    store = DeltaStore(spark, str(tmp_path / name))
    store.write_batch(
        spark.createDataFrame(
            [(1, 10, "a"), (2, None, "b"), (3, 30, "c")],
            f"{HANDLE} long, a long, s string",
        ),
        version=1,
    )
    return store


def test_read_where_null_after_rename(spark, tmp_path):
    store = _store(spark, tmp_path, "rn")
    store.add_column("pad", "long")  # bootstrap the manifest
    store.rename_column("a", "b")
    # data lives under stored name 'a'; visible 'b' is NULL only for h=2
    got = {r[HANDLE] for r in store.read_where_null("b").collect()}
    assert got == {2}
    # non-NULL visible values must NOT be returned (the pre-fix failure
    # mode: 'b' not in stored columns -> lit(True) -> every row)
    vals = {r[HANDLE]: r["b"] for r in store.read().collect()}
    assert vals == {1: 10, 2: None, 3: 30}


def test_read_where_null_after_add_default(spark, tmp_path):
    store = _store(spark, tmp_path, "dflt")
    store.add_column("score", "long", default=7)
    # pre-ADD rows read as the default (not NULL); an explicit post-DDL
    # NULL write stays NULL
    store.write_batch(
        spark.createDataFrame(
            [(4, 40, "d", None)], f"{HANDLE} long, a long, s string, score long"
        ),
        version=2,
    )
    got = {r[HANDLE] for r in store.read_where_null("score").collect()}
    assert got == {4}


def test_read_where_null_generated_column(spark, tmp_path):
    store = _store(spark, tmp_path, "gen")
    store.add_generated_column("a2", "long", "a * 2")
    got = {r[HANDLE] for r in store.read_where_null("a2").collect()}
    assert got == {2}


def test_read_late_after_rename_filter_and_payload(spark, tmp_path):
    store = _store(spark, tmp_path, "lm_rn")
    store.add_column("pad", "long")
    store.rename_column("a", "b")
    # filter on the renamed column: data under stored 'a'
    got = {r[HANDLE]: r["b"] for r in store.read_late("b", 10, 30).collect()}
    assert got == {1: 10, 3: 30}
    # renamed column as PAYLOAD with the filter on another column
    got = {
        r[HANDLE]: r["b"]
        for r in store.read_late("s", values=["a", "c"], payload_cols=["b"]).collect()
    }
    assert got == {1: 10, 3: 30}


def test_read_late_after_add_default(spark, tmp_path):
    store = _store(spark, tmp_path, "lm_df")
    store.add_column("score", "long", default=7)
    store.write_batch(
        spark.createDataFrame(
            [(4, 40, "d", 99)], f"{HANDLE} long, a long, s string, score long"
        ),
        version=2,
    )
    # pre-ADD rows are visibly 7 and must match score=7
    got = {r[HANDLE]: r["score"] for r in store.read_late("score", values=[7]).collect()}
    assert got == {1: 7, 2: 7, 3: 7}
    # defaulted column as payload
    got = {
        r[HANDLE]: r["score"]
        for r in store.read_late("a", 30, 40, payload_cols=["score"]).collect()
    }
    assert got == {3: 7, 4: 99}


def test_read_late_generated_filter_and_payload(spark, tmp_path):
    store = _store(spark, tmp_path, "lm_gen")
    store.add_generated_column("a2", "long", "a * 2")
    got = {r[HANDLE]: r["a2"] for r in store.read_late("a2", 20, 60).collect()}
    assert got == {1: 20, 3: 60}
    got = {
        r[HANDLE]: r["a2"]
        for r in store.read_late("s", values=["c"], payload_cols=["a2"]).collect()
    }
    assert got == {3: 60}


def test_read_late_conj_mixed_ddl_predicates(spark, tmp_path):
    store = _store(spark, tmp_path, "lm_conj")
    store.add_column("score", "long", default=7)
    store.rename_column("a", "b")
    store.add_generated_column("b2", "long", "b * 2")
    got = {
        r[HANDLE]
        for r in store.read_late_conj(
            [("b", 10, 30), ("score", [7]), ("b2", 20, None)]
        ).collect()
    }
    assert got == {1, 3}


def test_ddl_shadowed_column_disables_stale_index_pruning(spark, tmp_path):
    """A zone map / inverted index built over STORED bytes must not prune
    segments for a column whose visible values differ (ADD-DEFAULT): a
    pre-ADD segment stores nothing for the column, yet every visible
    value is the default."""
    store = DeltaStore(spark, str(tmp_path / "zm"))
    store.write_batch(
        spark.createDataFrame(
            [(i, i * 10) for i in range(40)], f"{HANDLE} long, a long"
        ),
        version=1,
    )
    store.compact(ts=1, num_segments=4)
    store.build_zonemap(["a"])
    store.add_column("score", "long", default=5)
    # zone map knows nothing about 'score'; stored bytes are absent —
    # equality/range on the default value must still see every row
    assert store.read_where("score", 5, 5).count() == 40
    got = {r[HANDLE] for r in store.read_where_null("score").collect()}
    assert got == set()
    # and range reads on the renamed zone-mapped column survive a RENAME
    store.rename_column("a", "b")
    assert store.read_where("b", 100, 150).count() == 6
    assert store.last_scan_profile["segments_pruned"] == 0  # guard kicked in

"""Bulk snapshot ingest into DeltaStore — the SST/snapshot load path
(reference Storages/DeltaMerge/DeltaMergeStore_Ingest.cpp,
Decode/SSTFilesToBlockInputStream.h): files land in stable directly,
MVCC upsert semantics and every segment-pruning mode stay sound."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore


def _df(spark, rows):
    return spark.createDataFrame(rows, f"{HANDLE} long, v string")


def test_ingest_into_empty_store(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "s"))
    n = store.ingest_snapshot(_df(spark, [(1, "a"), (2, "b")]), version=5)
    assert n == 2
    assert {r[HANDLE]: r.v for r in store.read().collect()} == {1: "a", 2: "b"}


def test_ingest_upserts_over_existing_rows(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "s"))
    store.write_batch(_df(spark, [(1, "old"), (2, "keep")]), version=1)
    store.ingest_snapshot(_df(spark, [(1, "new"), (3, "c")]), version=2)
    latest = {r[HANDLE]: r.v for r in store.read().collect()}
    assert latest == {1: "new", 2: "keep", 3: "c"}
    # snapshot read BEFORE the ingest version still sees the old world
    old = {r[HANDLE]: r.v for r in store.read(ts=1).collect()}
    assert old == {1: "old", 2: "keep"}


def test_ingest_respects_hash_segments(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "s"))
    store.write_batch(_df(spark, [(i, f"v{i}") for i in range(8)]), version=1)
    store.compact(ts=1, num_segments=4)
    store.ingest_snapshot(_df(spark, [(100, "x"), (101, "y")]), version=2)
    # point reads prune by segment and must still see ingested handles
    got = {r[HANDLE]: r.v for r in store.read_handles([3, 100, 101]).collect()}
    assert got == {3: "v3", 100: "x", 101: "y"}
    assert store.read().count() == 10


def test_ingest_extends_range_manifest(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "s"))
    store.write_batch(_df(spark, [(i, f"v{i}") for i in range(10)]), version=1)
    store.compact_range_segments(ts=1, num_segments=3)
    # handles far beyond the old [0, 10) range
    store.ingest_snapshot(_df(spark, [(50, "far"), (60, "farther")]), version=2)
    got = {r[HANDLE]: r.v for r in store.read_range(45, 65).collect()}
    assert got == {50: "far", 60: "farther"}
    # the old range still reads
    assert store.read_range(0, 10).count() == 10


def test_ingest_conforms_to_schema_version(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "s"))
    store.write_batch(_df(spark, [(1, "a")]), version=1)
    store.compact(ts=1)
    store.add_column("score", "int")
    # snapshot lacking the new column ingests with NULL score
    store.ingest_snapshot(_df(spark, [(2, "b")]), version=2)
    rows = {r[HANDLE]: (r.v, r.score) for r in store.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", None)}
    # unknown columns are an error, not silent loss
    bad = spark.createDataFrame([(3, "c", 1.5)], f"{HANDLE} long, v string, bogus double")
    try:
        store.ingest_snapshot(bad, version=3)
        raise AssertionError("expected ValueError for unknown column")
    except ValueError:
        pass

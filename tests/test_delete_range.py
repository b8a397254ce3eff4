"""Range deletes on DeltaStore — the reference's
DeltaMergeStore::deleteRange (DeltaMergeStore.cpp:812): a delete-range
entry masks every covered row written before it, merge-on-read applies it
as part of MVCC, and delta merge applies it physically then GCs the
entry. Tombstones are O(1) metadata in the delta version dir, never a
scan at write time."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore


def _rows(spark, items):
    return spark.createDataFrame([Row(**{HANDLE: h, "v": v}) for h, v in items])


def _store(spark, path, n=100):
    store = DeltaStore(spark, path)
    store.write_batch(_rows(spark, [(h, h * 10) for h in range(n)]), version=1)
    return store


def _ids(df):
    return {r[HANDLE] for r in df.collect()}


def test_delete_range_hides_covered_rows(spark, tmp_path):
    store = _store(spark, str(tmp_path / "d1"))
    store.delete_range(20, 40, version=2)
    got = _ids(store.read())
    assert got == set(range(0, 20)) | set(range(40, 100))
    # half-open: 40 survives, 20 does not
    assert 40 in got and 20 not in got


def test_snapshot_below_tombstone_still_sees_rows(spark, tmp_path):
    """Time travel: a read at ts < tombstone version ignores it — the
    rows were alive at that snapshot."""
    store = _store(spark, str(tmp_path / "d2"))
    store.delete_range(20, 40, version=5)
    assert _ids(store.read(ts=1)) == set(range(100))
    assert _ids(store.read(ts=5)) == set(range(0, 20)) | set(range(40, 100))


def test_write_after_delete_resurrects(spark, tmp_path):
    """A row written to the range AFTER the tombstone's version is
    visible — the tombstone only masks older versions (Raft ordering)."""
    store = _store(spark, str(tmp_path / "d3"))
    store.delete_range(0, 100, version=2)
    store.write_batch(_rows(spark, [(30, 333)]), version=3)
    got = {r[HANDLE]: r.v for r in store.read().collect()}
    assert got == {30: 333}
    # delete-wins at the EQUAL version: a row stamped v=2 is covered
    store.write_batch(_rows(spark, [(31, 311)]), version=2)
    assert _ids(store.read()) == {30}


def test_compact_applies_and_gcs_tombstones(spark, tmp_path):
    store = _store(spark, str(tmp_path / "d4"))
    store.delete_range(20, 40, version=2)
    n = store.compact(ts=2, num_segments=4)
    assert n == 80  # physically gone
    assert store._range_dels() == []  # entry GC'd
    assert _ids(store.read()) == set(range(0, 20)) | set(range(40, 100))


def test_compact_carries_newer_tombstone(spark, tmp_path):
    """A tombstone newer than the GC safe-point survives the compaction
    (written into the fresh delta dir BEFORE the pointer swap) and keeps
    masking the compacted stable rows."""
    store = _store(spark, str(tmp_path / "d5"))
    store.delete_range(20, 40, version=9)
    n = store.compact(ts=1, num_segments=4)
    assert n == 100  # nothing applied: tombstone v=9 > safe-point 1
    assert store._range_dels() == [{"lo": 20, "hi": 40, "v": 9}]
    # the carried tombstone still masks at ts >= 9
    assert _ids(store.read(ts=9)) == set(range(0, 20)) | set(range(40, 100))
    assert _ids(store.read(ts=1)) == set(range(100))
    # a later compact at ts >= 9 applies + GCs it
    store.compact(ts=9, num_segments=4)
    assert store._range_dels() == []
    assert _ids(store.read()) == set(range(0, 20)) | set(range(40, 100))


def test_incremental_compact_dirties_overlapping_segments(spark, tmp_path):
    """Range tombstones dirty every overlapping segment even with an
    empty delta tail — their partitions are rewritten with the tombstone
    applied, cold segments stay hardlinked, and the entry is GC'd."""
    store = _store(spark, str(tmp_path / "d6"))
    store.compact_range_segments(ts=1, num_segments=4)  # width 25
    store.delete_range(30, 45, version=2)  # overlaps segments 1 only
    rewritten, total = store.compact_segments_incremental(ts=2)
    assert (rewritten, total) == (1, 4)
    assert store._range_dels() == []
    assert _ids(store.read()) == set(range(0, 30)) | set(range(45, 100))
    # read_range over the rewritten segment agrees
    assert _ids(store.read_range(25, 50)) == {25, 26, 27, 28, 29} | set(range(45, 50))


def test_range_reads_apply_tombstones(spark, tmp_path):
    store = _store(spark, str(tmp_path / "d7"))
    store.compact_range_segments(ts=1, num_segments=4)
    store.build_zonemap(["v"])
    store.build_inverted_index(["v"])
    store.delete_range(10, 15, version=2)
    assert _ids(store.read_range(0, 20)) == set(range(0, 10)) | set(range(15, 20))
    assert _ids(store.read_handles([5, 12])) == {5}
    # zone-map path: values of deleted handles must not surface
    assert _ids(store.read_where("v", 100, 140)) == set()
    assert _ids(store.read_where("v", 150, 190)) == {15, 16, 17, 18, 19}
    # inverted-index path
    assert store.read_where_in("v", [120]).count() == 0
    assert store.read_where_in("v", [150]).count() == 1


def test_crash_between_swap_steps_never_loses_tombstone(spark, tmp_path):
    """The carry into the fresh delta dir happens before the superblock
    commit: whichever snapshot a crash leaves current, the newer-than-
    safe-point tombstone is present and masking."""
    store = _store(spark, str(tmp_path / "d8"))
    store.delete_range(20, 40, version=9)
    for point in ("staged", "before_commit", "after_commit"):
        store.failpoints = {point}
        with pytest.raises(RuntimeError):
            store.compact(ts=1, num_segments=4)
        store.failpoints = set()
        reopened = DeltaStore(spark, store.path)
        assert reopened._range_dels() == [{"lo": 20, "hi": 40, "v": 9}]
        assert _ids(reopened.read(ts=9)) == set(range(0, 20)) | set(range(40, 100))


def test_string_handle_range_delete(spark, tmp_path):
    """Common-handle (clustered index) stores: lexicographic half-open
    range, same machinery."""
    store = DeltaStore(spark, str(tmp_path / "d9"))
    rows = [Row(**{HANDLE: f"k{i:03d}", "v": i}) for i in range(50)]
    store.write_batch(spark.createDataFrame(rows), version=1)
    store.delete_range("k010", "k020", version=2)
    got = _ids(store.read())
    assert got == {f"k{i:03d}" for i in range(50) if not (10 <= i < 20)}
    store.compact(ts=2)
    assert store._range_dels() == []
    assert _ids(store.read()) == got

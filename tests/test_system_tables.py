"""DT_SEGMENTS / DT_TABLES system-table analogues
(dbms/src/Storages/System/StorageSystemDTSegments.cpp, ...DTTables.cpp)."""

from __future__ import annotations

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.delta_store import DeltaStore


def _rows(spark, n):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], f"{HANDLE} long, v string"
    )


def test_dt_segments_rows_bounds_and_delta_assignment(spark, tmp_path):
    s = DeltaStore(spark, str(tmp_path / "t"))
    s.write_batch(_rows(spark, 20), version=1)
    s.compact_range_segments(ts=1, num_segments=3)
    s.build_zonemap(["v"])
    # delta touches seg 0 (handle 3) and, clamped, the last segment (25)
    s.write_batch(
        spark.createDataFrame([(3, "b"), (25, "c")], f"{HANDLE} long, v string"),
        version=2,
    )
    segs = {r.seg: r for r in s.system_dt_segments().collect()}
    assert sorted(segs) == [0, 1, 2]
    assert sum(r.stable_rows for r in segs.values()) == 20
    assert all(r.stable_bytes > 0 for r in segs.values())
    assert all(r.zonemap for r in segs.values())
    assert segs[0].delta_rows == 1 and segs[2].delta_rows == 1
    assert segs[1].delta_rows == 0
    # bounds are the manifest's, rendered as strings
    assert segs[0].range_lo == "0" and int(segs[2].range_hi) >= 20


def test_dt_segments_unsegmented_and_empty(spark, tmp_path):
    s = DeltaStore(spark, str(tmp_path / "t"))
    assert s.system_dt_segments().count() == 0
    s.write_batch(_rows(spark, 5), version=1)
    s.compact(ts=1)
    [row] = s.system_dt_segments().collect()
    assert row.seg is None and row.stable_rows == 5 and row.delta_rows == 0


def test_dt_tables_summary(spark, tmp_path):
    s = DeltaStore(spark, str(tmp_path / "t"))
    s.write_batch(_rows(spark, 12), version=1)
    s.compact_range_segments(ts=1, num_segments=2)
    s.build_inverted_index(["v"])
    s.write_batch(
        spark.createDataFrame([(99, "x")], f"{HANDLE} long, v string"), version=2
    )
    s.delete_range(3, 5, version=3)
    [t] = s.system_dt_tables().collect()
    assert t.layout == "range" and t.n_segments == 2
    assert t.stable_rows == 12 and t.delta_rows == 1
    assert t.range_tombstones == 1 and t.inverted_indexes == 1
    assert not t.zonemap

"""Replay the reference's ``tests/delta-merge-test`` DBGInvoke scripts
(sources/dbgscript.py) — the mock-Raft + SQL-to-DAG integration layer.

All 84 scripts replay green (box-art goldens, run-test.py fuzz semantics:
unordered row multiset, value-level cell compare).  Scripts are read from
the reference tree at run time, never vendored; the module skips when the
tree is absent.

The default run covers a representative core (one per directory family,
~80 s); ``DELTAMERGE_ALL=1`` replays the full 84 (~6 min on local[8]) —
the same gating pattern as test_fullstack_scripts.py.
"""

from __future__ import annotations

import os

import pytest

from tiflash_spark.sources.dbgscript import DELTA_MERGE_TESTS, run_script

# long replay sweep: excluded from the default run (pytest.ini addopts);
# scripts/full_suite.sh runs everything
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not DELTA_MERGE_TESTS.exists(), reason="reference tree not present"
    ),
]

PASSING: list[str] = [
    "example.test",
    "query/data_type/data_type_number.test",
    "query/data_type/data_type_others.test",
    "query/data_type/data_type_time.test",
    "query/data_type/data_type_time_bit.test",
    "query/data_type/decimal/agg.test",
    "query/data_type/decimal/arithmetic.test",
    "query/data_type/decimal/cast.test",
    "query/data_type/decimal/default_value.test",
    "query/data_type/decimal/insert.test",
    "query/data_type/decimal/insert_mutable.test",
    "query/data_type/decimal/pr359.test",
    "query/data_type/mydatetime/cast.test",
    "query/data_type/mydatetime/compare.test",
    "query/data_type/mydatetime/insert.test",
    "query/executor/filter_non_uint8.test",
    "query/executor/table_scan.test",
    "query/expr/aggregation_uniq.test",
    "query/expr/cast_as_decimal.test",
    "query/expr/cast_as_int.test",
    "query/expr/cast_as_real.test",
    "query/expr/cast_as_string.test",
    "query/expr/cast_as_time.test",
    "query/expr/compare_op.test",
    "query/expr/date_format.test",
    "query/expr/from_unixtime.test",
    "query/expr/json.test",
    "query/expr/logical_op.test",
    "query/misc/arrow_encode.test",
    "query/misc/chblock_encode.test",
    "query/misc/collator.test",
    "query/misc/duration_cast.test",
    "query/misc/key_condition.test",
    "query/misc/key_range.test",
    "query/misc/time_zone.test",
    "query/misc/timestamp_rough_set_filter.test",
    "query/mpp/aggregation_empty_input.test",
    "query/mpp/aggregation_mpp.test",
    "query/mpp/collator_mpp.test",
    "query/mpp/decimal_hash.test",
    "query/mpp/duration_mpp.test",
    "query/mpp/enum_mpp.test",
    "query/mpp/exchange_with_timestamp_col.test",
    "query/mpp/join_mpp.test",
    "query/mpp/mpp_hang.test",
    "query/mpp/partition_exchange.test",
    "query/mpp/partition_table.test",
    "raft/bugs/FLASH-484.test",
    "raft/bugs/flash-451.test",
    "raft/bugs/substream_seek.test",
    "raft/ingest_sst.test",
    "raft/read_with_specify_tso.test",
    "raft/region_merge.test",
    "raft/region_merge_common_handle.test",
    "raft/remove_region.test",
    "raft/remove_region_common_handle.test",
    "raft/schema/alter_for_nullable.test",
    "raft/schema/alter_on_read.test",
    "raft/schema/alter_on_write.test",
    "raft/schema/concurrent_ddl_conflict.test",
    "raft/schema/create_tidb_tables.test",
    "raft/schema/default_value.test",
    "raft/schema/drop_on_read.test",
    "raft/schema/drop_on_restart.test",
    "raft/schema/mydate.test",
    "raft/schema/rename_column.test",
    "raft/schema/truncate_on_read.test",
    "raft/snapshot.test",
    "raft/snapshot_common_handle.test",
    "raft/snapshot_dtfile.test",
    "raft/sync_table_from_raft.test",
    "raft/sync_table_from_raft_common_handle.test",
    "raft/txn_mock/decimal.test",
    "raft/txn_mock/delete.test",
    "raft/txn_mock/insert.test",
    "raft/txn_mock/merge_rollback.test",
    "raft/txn_mock/order_by.test",
    "raft/txn_mock/partition_table.test",
    "raft/txn_mock/select.test",
    "raft/txn_mock/selraw.test",
    "raft/txn_mock/snapshot_cache.test",
    "raft/txn_mock/snapshot_no_overlap.test",
    "raft/txn_mock/split.test",
    "raft/txn_mock/split_merge_split.test",
]

# one per surface family: scan, MVCC write/read, schema DDL, snapshot apply,
# region topology, expr/cast, duration, collation, partitions, dtfile ingest
CORE = [
    "query/executor/table_scan.test",
    "raft/txn_mock/select.test",
    "raft/txn_mock/snapshot_cache.test",
    "raft/schema/rename_column.test",
    "raft/region_merge.test",
    "raft/snapshot_dtfile.test",
    "query/expr/cast_as_int.test",
    "query/data_type/decimal/insert.test",
    "query/misc/duration_cast.test",
    "raft/txn_mock/partition_table.test",
]

_ALL = os.environ.get("DELTAMERGE_ALL") == "1"


@pytest.mark.parametrize("rel", PASSING if _ALL else CORE)
def test_deltamerge_script(spark, tmp_path, rel):
    res = run_script(spark, DELTA_MERGE_TESTS / rel, str(tmp_path))
    assert res.ok, "\n".join(res.mismatches[:10])
    if res.steps_run == 0:
        # a script may self-disable with #RETURN before its first command
        # (mpp_hang.test: "mpp hang detect is disabled") — run-test.py
        # stops there too, and an empty replay is its correct outcome
        text = (DELTA_MERGE_TESTS / rel).read_text()
        body = text.split("#RETURN")[0]
        assert "#RETURN" in text and "=> " not in body and ">> " not in body
    else:
        assert res.checked > 0


def test_all_scripts_adjudicated():
    """Every .test file under delta-merge-test is in the PASSING list —
    the suite is fully swept, nothing silently skipped."""
    all_scripts = sorted(
        str(p.relative_to(DELTA_MERGE_TESTS))
        for p in DELTA_MERGE_TESTS.rglob("*.test")
    )
    assert all_scripts == sorted(PASSING)


def test_snapshot_over_live_rows_keeps_raw_tso(spark, tmp_path):
    """Round-10 pin for the reference's applySnapshot semantics the suite
    itself never observes: applying a snapshot OVER previously-visible
    rows physically replaces the range, and the ingested rows keep their
    RAW commit-ts — visible through selraw's _INTERNAL_VERSION and a
    read-tso-gated read (round-9 shifted them above a mask tombstone)."""
    script = tmp_path / "raw_tso_snapshot.test"
    script.write_text("""
=> DBGInvoke __enable_schema_sync_service('false')
=> DBGInvoke __clean_up_region()
=> DBGInvoke __drop_tidb_table(default, test_dm)
=> DBGInvoke __refresh_schemas()
=> DBGInvoke __mock_tidb_table(default, test_dm, 'col_1 Int64')
=> DBGInvoke __refresh_mapped_table_schema(default, test_dm)
=> DBGInvoke __region_snapshot(4, 0, 1000, default, test_dm)
=> DBGInvoke __raft_insert_row_full(default, test_dm, 4, 2, 1, 0, 10)
=> DBGInvoke __raft_insert_row_full(default, test_dm, 4, 2, 3, 0, 11)
=> DBGInvoke __raft_insert_row_full(default, test_dm, 4, 1, 2, 0, 12)
=> DBGInvoke __try_flush_region(4)
=> DBGInvoke query_mapped('select * from \\$d.\\$t order by _tidb_rowid', default, test_dm)
┌─col_1─┬─_tidb_rowid─┐
│    12 │           1 │
│    11 │           2 │
└───────┴─────────────┘
=> DBGInvoke __region_snapshot_data(
    default, test_dm,
    4, 0, 1000,
    2, 3, 0, 21,
    1, 3, 0, 23
    )
=> DBGInvoke __try_flush_region(4)
=> DBGInvoke query_mapped('selraw col_1, _INTERNAL_VERSION from \\$d.\\$t', default, test_dm)
┌─col_1─┬─_INTERNAL_VERSION─┐
│    23 │                 3 │
│    21 │                 3 │
└───────┴───────────────────┘
>> DBGInvoke query_mapped('select * from \\$d.\\$t order by _tidb_rowid', default, test_dm) " --read_tso "3
┌─col_1─┬─_tidb_rowid─┐
│    23 │           1 │
│    21 │           2 │
└───────┴─────────────┘
>> DBGInvoke query_mapped('select * from \\$d.\\$t order by _tidb_rowid', default, test_dm) " --read_tso "2
┌─col_1─┬─_tidb_rowid─┐
└───────┴─────────────┘
=> DBGInvoke __drop_tidb_table(default, test_dm)
=> DBGInvoke __refresh_schemas()
""")
    res = run_script(spark, script, str(tmp_path))
    assert res.ok, "\n".join(res.mismatches[:10])
    assert res.checked >= 4

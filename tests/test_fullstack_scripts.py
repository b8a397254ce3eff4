"""Replay the reference's own fullstack ``.test`` scripts, verbatim,
through the SQL surface (sources/testscript.run_script → admin_sql.run_sql
→ DeltaStore).

The reference drives its end-to-end suites through mysql-client scripts
(``tests/fullstack-test*/**/*.test`` executed by ``tests/run-test.py``);
this is the same transcript replayed against this engine — statements are
read from the reference tree at run time (never copied here) and the test
module skips when the tree is absent.

PASSING is the curated allowlist below (kept in sweep order —
scripts/fullstack_sweep.py regenerates it). Scripts NOT in the list
diverge for a reason recorded in KNOWN_DIVERGENT and are xfail-style
documented rather than silently dropped.
"""

from __future__ import annotations

import os

import pytest

from tiflash_spark.sources.testscript import REFERENCE_TESTS, run_script

pytestmark = pytest.mark.skipif(
    not REFERENCE_TESTS.exists(), reason="reference tree not present"
)

# scripts that replay green end-to-end (value-level compare, unordered
# multiset — the reference's own comparison rules)
PASSING: list[str] = [
    "fullstack-test-index/inverted/create-on-alter-table.test",
    "fullstack-test-index/inverted/create-on-create-table.test",
    "fullstack-test-index/inverted/datetime-type.test",
    "fullstack-test-index/inverted/modify-data-type.test",
    "fullstack-test-index/inverted/unsupported-type.test",
    "fullstack-test-index/vector/distance.test",
    "fullstack-test-index/vector/func.test",
    "fullstack-test-index/vector/issue_10809.test",
    "fullstack-test-index/vector/vector-index-on-create.test",
    "fullstack-test-index/vector/vector-index-on-partition.test",
    "fullstack-test-index/vector/vector-index.test",
    "fullstack-test/expr/adddate_string_real.test",
    "fullstack-test/expr/agg_pushdown.test",
    "fullstack-test/expr/ascii_pushdown.test",
    "fullstack-test/expr/bin.test",
    "fullstack-test/expr/bitshift_operator.test",
    "fullstack-test/expr/bitwise_operator.test",
    "fullstack-test/expr/cast_as_decimal.test",
    "fullstack-test/expr/cast_as_duration.test",
    "fullstack-test/expr/cast_as_json_issue10845.test",
    "fullstack-test/expr/cast_as_time.test",
    "fullstack-test/expr/cast_decimal_as_real.test",
    "fullstack-test/expr/cast_decimal_overflow.test",
    "fullstack-test/expr/cast_json_as_string.test",
    "fullstack-test/expr/cast_nullability.test",
    "fullstack-test/expr/cast_string_as_decimal.test",
    "fullstack-test/expr/cast_string_as_int.test",
    "fullstack-test/expr/cast_string_as_real.test",
    "fullstack-test/expr/cast_time_as_int.test",
    "fullstack-test/expr/cast_time_as_string.test",
    "fullstack-test/expr/ceil_floor.test",
    "fullstack-test/expr/coalesce_pushdown.test",
    "fullstack-test/expr/column_filter.test",
    "fullstack-test/expr/compare_null.test",
    "fullstack-test/expr/concat.test",
    "fullstack-test/expr/concat_ws.test",
    "fullstack-test/expr/date.test",
    "fullstack-test/expr/date_add.test",
    "fullstack-test/expr/date_diff.test",
    "fullstack-test/expr/date_sub.test",
    "fullstack-test/expr/datename_monthname.test",
    "fullstack-test/expr/datetime_literal.test",
    "fullstack-test/expr/day_of_month.test",
    "fullstack-test/expr/day_of_weekyear.test",
    "fullstack-test/expr/decimal_compare.test",
    "fullstack-test/expr/duplicate_column.test",
    "fullstack-test/expr/duration_filter_late_materialization.test",
    "fullstack-test/expr/duration_filter_late_materialization2.test",
    "fullstack-test/expr/duration_pushdown.test",
    "fullstack-test/expr/elt.test",
    "fullstack-test/expr/empty_input_for_udaf.test",
    "fullstack-test/expr/enum.test",
    "fullstack-test/expr/expr_tree_too_deep.test",
    "fullstack-test/expr/extract_datetime.test",
    "fullstack-test/expr/extract_datetime_from_string.test",
    "fullstack-test/expr/extract_duration.test",
    "fullstack-test/expr/first_row.test",
    "fullstack-test/expr/from_unixtime.test",
    "fullstack-test/expr/generated_columns.test",
    "fullstack-test/expr/generated_columns2.test",
    "fullstack-test/expr/generated_index.test",
    "fullstack-test/expr/get_format.test",
    "fullstack-test/expr/hex_int.test",
    "fullstack-test/expr/hex_str.test",
    "fullstack-test/expr/ifnull.test",
    "fullstack-test/expr/ilike_pushdown.test",
    "fullstack-test/expr/in_expression.test",
    "fullstack-test/expr/is_ip_addr.test",
    "fullstack-test/expr/is_true_false.test",
    "fullstack-test/expr/json_array.test",
    "fullstack-test/expr/json_contains_path.test",
    "fullstack-test/expr/json_depth.test",
    "fullstack-test/expr/json_extract.test",
    "fullstack-test/expr/json_keys.test",
    "fullstack-test/expr/json_length.test",
    "fullstack-test/expr/json_object.test",
    "fullstack-test/expr/json_unquote.test",
    "fullstack-test/expr/json_unquote_extract.test",
    "fullstack-test/expr/json_valid.test",
    "fullstack-test/expr/last_day.test",
    "fullstack-test/expr/least_greatest.test",
    "fullstack-test/expr/length_pushdown.test",
    "fullstack-test/expr/logical_op.test",
    "fullstack-test/expr/math_func.test",
    "fullstack-test/expr/null_literal.test",
    "fullstack-test/expr/nulleq.test",
    "fullstack-test/expr/pad.test",
    "fullstack-test/expr/position_pushdown.test",
    "fullstack-test/expr/replace.test",
    "fullstack-test/expr/reverse.test",
    "fullstack-test/expr/runtime_filter.test",
    "fullstack-test/expr/single_ifnull_in_predicate.test",
    "fullstack-test/expr/space.test",
    "fullstack-test/expr/special_new_decimal_type.test",
    "fullstack-test/expr/sqrt.test",
    "fullstack-test/expr/str_to_date.test",
    "fullstack-test/expr/strcmp.test",
    "fullstack-test/expr/substring_index.test",
    "fullstack-test/expr/substring_utf8.test",
    "fullstack-test/expr/timestamp_filter.test",
    "fullstack-test/expr/timestamp_filter_late_materialization.test",
    "fullstack-test/expr/timestamp_literal.test",
    "fullstack-test/expr/to_seconds.test",
    "fullstack-test/expr/topn.test",
    "fullstack-test/expr/trim.test",
    "fullstack-test/expr/trim_pushdown.test",
    "fullstack-test/expr/unary_minus.test",
    "fullstack-test/expr/unhex.test",
    "fullstack-test/expr/unixTimeStamp.test",
    "fullstack-test/expr/upper.test",
    "fullstack-test/expr/upper_and_lower.test",
    "fullstack-test/expr/week_of_year.test",
    "fullstack-test/expr/year-month-day.test",
    "fullstack-test/issues/issue_10809_int_decimal.test",
    "fullstack-test/issues/issue_10809_varchar.test",
    "fullstack-test/issues/issue_1796.test",
    "fullstack-test/issues/issue_1962.test",
    "fullstack-test/issues/issue_2471.test",
    "fullstack-test/issues/issue_3333.test",
    "fullstack-test/issues/issue_3373.test",
    "fullstack-test/issues/issue_3447.test",
    "fullstack-test/issues/issue_6807.test",
    "fullstack-test/issues/issue_7519.test",
    "fullstack-test/issues/issue_7695.test",
    "fullstack-test/issues/issue_8111.test",
    "fullstack-test/issues/issue_8113.test",
    "fullstack-test/issues/issue_8562.test",
    "fullstack-test/issues/issue_8601.test",
    "fullstack-test/issues/issue_8607.test",
    "fullstack-test/issues/issue_8767.test",
    "fullstack-test/issues/issue_8799.test",
    "fullstack-test/issues/issue_8811.test",
    "fullstack-test/mpp/align_schema.test",
    "fullstack-test/mpp/apply.test",
    "fullstack-test/mpp/apply_with_late_materialization.test",
    "fullstack-test/mpp/async_server_alarm.test",
    "fullstack-test/mpp/bool_column_filter.test",
    "fullstack-test/mpp/cartesian_join.test",
    "fullstack-test/mpp/count_not_return_null.test",
    "fullstack-test/mpp/dynamic_partition_prune.test",
    "fullstack-test/mpp/extra_physical_table_column.test",
    "fullstack-test/mpp/generated_column.test",
    "fullstack-test/mpp/having.test",
    "fullstack-test/mpp/issue10045.test",
    "fullstack-test/mpp/issue_6808.test",
    "fullstack-test/mpp/issue_8604.test",
    "fullstack-test/mpp/join_filter_on_constant_column.test",
    "fullstack-test/mpp/late_materialization_extra_table_id_column.test",
    "fullstack-test/mpp/late_materialization_generate_column.test",
    "fullstack-test/mpp/left_semi_family_joins.test",
    "fullstack-test/mpp/misc_join.test",
    "fullstack-test/mpp/mpp_fail.test",
    "fullstack-test/mpp/no_local_region.test",
    "fullstack-test/mpp/partition_table_with_time.test",
    "fullstack-test/mpp/remote_cop_fail.test",
    "fullstack-test/mpp/remote_read_virtual_column.test",
    "fullstack-test/mpp/remote_read_with_timestamp_filter.test",
    "fullstack-test/mpp/right_join.test",
    "fullstack-test/mpp/right_semi_family_join.test",
    "fullstack-test/mpp/rollup.test",
    "fullstack-test/mpp/rollup_tpcds.test",
    "fullstack-test/mpp/runtime_filter.test",
    "fullstack-test/mpp/window.test",
    "fullstack-test/mpp/window_range_frame.test",
    "fullstack-test2/ddl/alter_column_bit.test",
    "fullstack-test2/ddl/alter_column_datetime.test",
    "fullstack-test2/ddl/alter_column_when_pk_is_handle.test",
    "fullstack-test2/ddl/alter_create_database.test",
    "fullstack-test2/ddl/alter_create_database_crash.test",
    "fullstack-test2/ddl/alter_create_table.test",
    "fullstack-test2/ddl/alter_create_table_from_multi_regions.test",
    "fullstack-test2/ddl/alter_default_value.test",
    "fullstack-test2/ddl/alter_default_value_update.test",
    "fullstack-test2/ddl/alter_drop_table.test",
    "fullstack-test2/ddl/alter_drop_table_crash.test",
    "fullstack-test2/ddl/alter_pk.test",
    "fullstack-test2/ddl/alter_table_tiflash_replica.test",
    "fullstack-test2/ddl/alter_truncate_table.test",
    "fullstack-test2/ddl/binary_default_value.test",
    "fullstack-test2/ddl/datetime_default_value.test",
    "fullstack-test2/ddl/expression_index.test",
    "fullstack-test2/ddl/issue_10663.test",
    "fullstack-test2/ddl/multi_alter_with_write.test",
    "fullstack-test2/ddl/partitions/alter_exchange_partition.test",
    "fullstack-test2/ddl/partitions/alter_partition_by.test",
    "fullstack-test2/ddl/partitions/partition_basic.test",
    "fullstack-test2/ddl/partitions/remove_partitioning.test",
    "fullstack-test2/ddl/partitions/rename_column.test",
    "fullstack-test2/ddl/partitions/reorganize_partition.test",
    "fullstack-test2/ddl/rename_pk.test",
    "fullstack-test2/ddl/rename_table.test",
    "fullstack-test2/ddl/rename_table_across_databases.test",
    "fullstack-test2/ddl/rename_table_crash.test",
    "fullstack-test2/ddl/widen_pk.test",
    "fullstack-test2/dml/foreign_key_shared_lock_wide_row.test",
    "fullstack-test2/dml/test_table_scan.test",
    "fullstack-test2/dml/text_blob_type.test",
    "tidb-ci/disable_new_collation_fullstack/alter_default_value.test",
    "tidb-ci/new_collation_fullstack/clustered_index.test",
    "tidb-ci/new_collation_fullstack/count_distinct.test",
    "tidb-ci/new_collation_fullstack/expr.test",
    "tidb-ci/new_collation_fullstack/group_concat.test",
    "tidb-ci/new_collation_fullstack/join.test",
    "tidb-ci/new_collation_fullstack/operator.test",
    "tidb-ci/new_collation_fullstack/regexp.test",
    "tidb-ci/new_collation_fullstack/sort_constant_column.test",
    "tidb-ci/new_collation_fullstack/strcmp.test",
    # round 8: operator-pushdown goldens, clustered handles, flashback,
    # session variables
    "tidb-ci/fullstack-test-dt/aggregation_push_down.test",
    "tidb-ci/fullstack-test-dt/broadcast_join.test",
    "tidb-ci/fullstack-test-dt/distinct_agg_push_down.test",
    "tidb-ci/fullstack-test-dt/duplicated_columns.test",
    "tidb-ci/fullstack-test-dt/group_concat.test",
    "tidb-ci/fullstack-test-dt/issue_1425.test",
    "tidb-ci/fullstack-test-dt/mpp_join.test",
    "tidb-ci/fullstack-test-dt/projection_push_down.test",
    "tidb-ci/fullstack-test-dt/repeat_push_down.test",
    "tidb-ci/fullstack-test-dt/timestamp_with_timezone.test",
    "tidb-ci/fullstack-test-dt/union_push_down.test",
    "tidb-ci/fullstack-test/ddl/alter_add_drop_columns.test",
    "tidb-ci/fullstack-test/ddl/alter_datetime_default_value.test",
    "tidb-ci/fullstack-test/ddl/blocked_add_partition.test",
    "tidb-ci/fullstack-test/dml/partition_table.test",
    "fullstack-test2/clustered_index/data_type.test",
    "fullstack-test2/clustered_index/ddl.test",
    "fullstack-test2/clustered_index/issue_1514.test",
    "fullstack-test2/clustered_index/prefixNext.test",
    "fullstack-test2/clustered_index/query.test",
    "fullstack-test2/ddl/flashback/flashback_database.test",
    "fullstack-test2/ddl/flashback/flashback_table.test",
    "fullstack-test2/ddl/flashback/recover_table.test",
    "fullstack-test2/mpp/mpp-version.test",
    "fullstack-test2/mpp/null_aware_semi_join.test",
    "fullstack-test2/variables/set_variable_div_precision_increment.test",
    "fullstack-test2/variables/set_variable_fastscan.test",
    "fullstack-test/expr/return_warning.test",
    "fullstack-test/expr/sum_of_enum_pushdown.test",
    "fullstack-test2/ddl/alter_column_enum.test",
    "tidb-ci/new_collation_fullstack/default_value.test",
    "fullstack-test/expr/compare_year_with_date.test",
    "fullstack-test/expr/regexp.test",
    "fullstack-test/expr/cast_as_json.test",
    "fullstack-test/issues/issue_8482.test",
    "fullstack-test/fault-inject/exception_after_read_from_storage.test",
    "fullstack-test/fault-inject/mpp_hang.test",
    "fullstack-test/sample.test",
    "fullstack-test/system-table/read_system_table.test",
    "fullstack-test2/diagnostics/check_diagnostics.test",
    "fullstack-test/expr/decimal_divide.test",
    "fullstack-test/expr/lead_lag.test",
    "fullstack-test/expr/like.test",
    "fullstack-test2/ddl/alter_column_nullable.test",
    "tidb-ci/new_collation_fullstack/function_collator.test",
    "fullstack-test/mpp/window_agg.test",
]

# script -> reason we deliberately diverge (documented, not hidden).
# Scripts in NEITHER list are candidates still being driven down — run
# scripts/fullstack_sweep.py for the current per-script state.
KNOWN_DIVERGENT: dict[str, str] = {
    "fullstack-test/expr/from_days.test":
    "the reference's own MPP and cop modes disagree (NULL vs '10000-01-01' past range); we implement the MPP contract",
    "fullstack-test/expr/mod.test":
    "decimal256 group: decimal(65,*) operands exceed Spark's p<=38 hard cap (SURVEY §1.2); the p<=38 groups in the same script pass",
    "fullstack-test/expr/mod_extra.test":
    "decimal(65,*) operands exceed Spark's p<=38 (documented gap, SURVEY §1.2)",
    "fullstack-test/expr/format.test": "FORMAT of decimal(65,0) values needs >38 significant digits",
    "fullstack-test/expr/round.test":
    "decimal256 groups (sum(round(decimal(65))) carries 65 digits); the p<=38 groups pass",
    "fullstack-test/expr/round_with_frac.test": "float-domain rounding tails and p>38 decimals",
    "fullstack-test/expr/tidb_truncate.test": "float-domain truncation tails",
    "fullstack-test2/ddl/alter_decimal_default_value.test":
    "decimal256 defaults (decimal(65,*)) exceed Spark's p<=38",
    "fullstack-test/issues/issue_4519.test":
    "decimal(65,10)=decimal(65,0) join keys clamp to p=38, where Spark's max-precision comparison truncates the scale (0.1=0 compares true)",
    "tidb-ci/fullstack-test-dt/expr_push_down.test":
    "abs/group-by over decimal(65,30) needs >38 digits (SURVEY §1.2); "
    "the p<=38 statements in the same script pass",
    "tidb-ci/fail-point-tests/resolve-lock.test":
    "failure injection through TiDB's curl fail/tikvclient HTTP API — a "
    "client-side channel (async-commit prewrite faults) this engine has "
    "no analogue for; the SQL surface itself replays",
    "fullstack-test2/vector/vector-index-abort.test":
    "expects the index build to FAIL because the reference environment "
    "enables encryption-at-rest; no such environment constraint here",
}


# The full PASSING replay takes ~15 min (each script drives dozens of
# statements through the store); the routine suite runs a cross-section
# smoke subset — set FULLSTACK_ALL=1 to replay everything (the per-round
# coverage tool is scripts/fullstack_sweep.py).
SMOKE = [
    "fullstack-test/expr/bitshift_operator.test",
    "fullstack-test/expr/cast_as_duration.test",
    "fullstack-test/expr/cast_decimal_overflow.test",
    "fullstack-test/expr/date_sub.test",
    "fullstack-test/expr/date_diff.test",
    "fullstack-test/expr/is_true_false.test",
    "fullstack-test/expr/json_array.test",
    "fullstack-test/expr/json_valid.test",
    "fullstack-test/expr/least_greatest.test",
    "fullstack-test/expr/logical_op.test",
    "fullstack-test/expr/math_func.test",
    "fullstack-test/expr/pad.test",
    "fullstack-test/expr/substring_utf8.test",
    "fullstack-test/issues/issue_3447.test",
    "fullstack-test/mpp/extra_physical_table_column.test",
    "fullstack-test/mpp/rollup.test",
    "fullstack-test/mpp/window.test",
    "fullstack-test2/ddl/alter_create_database_crash.test",
    "fullstack-test2/ddl/alter_pk.test",
    "fullstack-test2/ddl/multi_alter_with_write.test",
    "fullstack-test2/ddl/rename_table.test",
    "fullstack-test2/dml/test_table_scan.test",
    "fullstack-test/expr/json_extract.test",
    "fullstack-test/expr/extract_duration.test",
    "fullstack-test/mpp/rollup_tpcds.test",
    "fullstack-test/mpp/left_semi_family_joins.test",
    "fullstack-test2/ddl/partitions/reorganize_partition.test",
    "tidb-ci/new_collation_fullstack/strcmp.test",
    "tidb-ci/new_collation_fullstack/operator.test",
]

_SELECTED = PASSING if os.environ.get("FULLSTACK_ALL") else SMOKE


@pytest.mark.parametrize("rel", _SELECTED)
def test_fullstack_script(spark, tmp_path, rel):
    res = run_script(spark, REFERENCE_TESTS / rel, str(tmp_path))
    assert not res.mismatches, "\n".join(res.mismatches[:10])
    assert res.checked > 0 or res.steps_run > 0


def test_passing_list_is_consistent():
    """Nothing is both green and documented-divergent, and every listed
    script exists in the reference tree."""
    assert not set(PASSING) & set(KNOWN_DIVERGENT)
    for rel in list(PASSING) + list(KNOWN_DIVERGENT):
        assert (REFERENCE_TESTS / rel).exists(), rel
    assert set(SMOKE) <= set(PASSING)

"""The SELECT rewrite pipeline (admin_sql.SELECT_REWRITE_PASSES): named,
ordered passes with an explicit contract — round-9 verdict ask #5.

These are TEXT-level tests (no SparkSession): each pass is a pure
``(sql, spark, stores) -> sql`` function whose applicability predicate
lives inside it, so the pipeline applies every pass unconditionally in
order. End-to-end behavior is covered by the replay suites; this file
pins the pass ORDER (the contract) and each pass's text transformation
in isolation.
"""

from __future__ import annotations

import pytest

from tiflash_spark.sources import admin_sql as A

EXPECTED_ORDER = [
    "strip_tidb_hints",
    "recursive_cte_limit",
    "strip_charset_introducers",
    "json_arrow_operators",
    "avg_div_precision",
    "enum_ordinals",
    "dec65_arithmetic",
    "dec65_var_scale_round",
    "abs_widen",
    "year_date_compare",
    "mixed_type_compare",
    "cast_as_json",
    "json_literal_compare",
    "mysql_cast_trim_exprs",
    "mysql_division_scale",
    "get_format_keyword",
    "partition_selects",
    "duration_literals",
    "hex_literals",
    "quoted_aliases",
    "simple_case_when_null",
    "searched_case_when_null",
    "ifnull_void",
    "if_void",
    "zero_frame_bounds",
    "div_null",
    "bit_operators",
    "xor_operator",
    "ilike",
    "like_escape",
    "in_table",
    "projected_in_subquery",
    "tuple_in",
    "binary_mixed_in",
    "mixed_in",
    "quantified_compares",
]


def _pass(name):
    return dict(A.SELECT_REWRITE_PASSES)[name]


def test_pass_order_is_the_contract():
    """The ordering contract is executable: any reorder/insert shows up
    here and must update the documented contract alongside."""
    assert [n for n, _ in A.SELECT_REWRITE_PASSES] == EXPECTED_ORDER
    names = [n for n, _ in A.SELECT_REWRITE_PASSES]
    assert len(names) == len(set(names))  # unique names
    # documented orderings
    assert names.index("json_arrow_operators") < names.index("mysql_cast_trim_exprs")
    assert names.index("dec65_arithmetic") < names.index("mysql_division_scale")
    assert names.index("hex_literals") < names.index("bit_operators")
    assert names.index("bit_operators") < names.index("xor_operator")
    assert names.index("simple_case_when_null") < names.index("searched_case_when_null")


def test_strip_tidb_hints():
    out = _pass("strip_tidb_hints")(
        "select /*+ read_from_storage(tiflash[t]) */ a from t", None, None
    )
    assert "/*+" not in out and "select" in out and " a from t" in out


def test_json_arrow_operators():
    out = _pass("json_arrow_operators")(
        "select j->'$.a', j->>'$.b' from t", None, None
    )
    assert "json_extract(j, '$.a')" in out
    assert "json_unquote(json_extract(j, '$.b'))" in out


def test_typed_domain_passes_noop_without_stores():
    for name in ("enum_ordinals", "dec65_arithmetic", "mixed_type_compare",
                 "cast_as_json", "json_literal_compare",
                 "year_date_compare", "dec65_var_scale_round", "abs_widen"):
        sql = "select a % b from t"
        assert _pass(name)(sql, None, None) == sql


def test_get_format_keyword():
    out = _pass("get_format_keyword")(
        "select get_format(DATE, 'USA')", None, None
    )
    assert "'DATE'," in out


def test_hex_literals_numeric_context():
    out = _pass("hex_literals")("select 0x1F + 1 from t", None, None)
    assert "31" in out and "0x1F" not in out
    # quoted spelling untouched
    out2 = _pass("hex_literals")("select '0x1F' from t", None, None)
    assert "'0x1F'" in out2


def test_quoted_aliases():
    out = _pass("quoted_aliases")('select 1 as "sum" from t', None, None)
    assert "AS `sum`" in out or "as `sum`" in out


def test_case_when_null_chain():
    s1 = _pass("simple_case_when_null")(
        "select case x when null then 1 else 2 end from t", None, None
    )
    s2 = _pass("searched_case_when_null")(s1, None, None)
    assert "when null then" not in s2.lower()


def test_void_null_functions():
    out = _pass("ifnull_void")("select ifnull(null, null) from t", None, None)
    assert "try_cast(NULL AS BOOLEAN)" in out
    out2 = _pass("if_void")("select if(a, null, null) from t", None, None)
    assert "try_cast(NULL AS BOOLEAN)" in out2


def test_zero_frame_bounds():
    out = _pass("zero_frame_bounds")(
        "select sum(a) over (order by b rows between 0 preceding and"
        " 0 following) from t", None, None,
    )
    assert "0 preceding" not in out.lower()
    assert out.lower().count("current row") == 2


def test_div_null():
    out = _pass("div_null")("select a DIV NULL from t", None, None)
    assert "CAST(NULL AS BIGINT)" in out


def test_passes_skip_ddl():
    ddl = 'create table t (a int, b varchar(10) default "x|y")'
    for name in ("quoted_aliases", "bit_operators", "xor_operator",
                 "mixed_in", "div_null"):
        assert _pass(name)(ddl, None, None) == ddl


def test_apply_select_rewrites_composes():
    out = A._apply_select_rewrites(
        None,
        "select /*+ agg_to_cop() */ j->>'$.k', 0x10 from t where a DIV NULL"
        " is null",
        None,
    )
    assert "/*+" not in out
    assert "json_unquote" in out
    assert "16" in out
    assert "CAST(NULL AS BIGINT)" in out

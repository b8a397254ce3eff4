"""MySQL JSON path grammar + per-row string functions (functions/
mysql_json.py) — pure-Python units pinned against the reference's own
fullstack expectations (expr/json_extract.test, json_keys.test,
json_contains_path.test, substring_index.test), which the replay suite
re-checks end-to-end through SQL."""

from __future__ import annotations

import pytest

from tiflash_spark.functions.mysql_json import (
    json_contains_path_py as jcp,
)
from tiflash_spark.functions.mysql_json import (
    json_extract_py as jx,
)
from tiflash_spark.functions.mysql_json import (
    json_keys_py as jk,
)
from tiflash_spark.functions.mysql_json import (
    parse_path,
    substring_index_py,
)


def test_json_extract_wildcards_and_autowrap():
    assert jx('{"a" : "b", "aa" : "bb"}', ["$.a"]) == '"b"'
    assert jx("[1,2,[3,4]]", ["$[2]"]) == "[3, 4]"
    assert jx('[1,2,{"a":"b"}]', ['$[0]."a"']) is None
    assert jx('"hello world"', ["$[*]"]) is None  # [*] never autowraps
    assert jx('{"a" : "b", "aa" : "bb"}', ["$.*"]) == '["b", "bb"]'
    assert jx("[1,2,[3,4]]", ["$[*]"]) == "[1, 2, [3, 4]]"
    assert jx('[1,2,{"a":"b"}]', ["$**.a"]) == '["b"]'
    assert jx('[1,2,{"a":"b"}]', ["$[0]", "$[1]", "$[2].a"]) == '[1, 2, "b"]'
    assert jx('"x"', ["$[0]"]) == '"x"'  # [0] autowraps scalars
    assert jx('{"a":1}', ["$.a", None]) is None  # NULL path nulls all
    assert jx(None, ["$.a"]) is None


def test_json_keys_object_order_and_paths():
    assert jk("{}", "$") == "[]"
    assert jk("[]", "$") is None  # arrays have no keys
    doc = '{"a":{"c":{}, "d":{}}, "b":{"e":{}, "f":{}}}'
    assert jk(doc, "$") == '["a", "b"]'
    assert jk(doc, "$.a") == '["c", "d"]'
    assert jk('{"a":1}', "$[0]") == '["a"]'
    assert jk('{"a":1}', "$[1]") is None
    assert jk(None, "$") is None and jk("{}", None) is None


def test_json_contains_path_short_circuit_null():
    # the reference's cross-join expectations: 'one' returns 1 BEFORE a
    # later NULL path is examined; 'all' returns 0 the same way
    assert jcp("{}", "all", ["$.a", None]) == 0
    assert jcp("{}", "all", ["$", None]) is None
    assert jcp("{}", "all", ["$[0]", None]) is None  # autowrap matches
    assert jcp("{}", "one", ["$", None]) == 1
    assert jcp("{}", "one", ["$.a", None]) is None
    assert jcp("[]", "one", ["$[0]", None]) is None  # [] has no element 0
    assert jcp(None, "one", ["$"]) is None
    assert jcp("{}", None, ["$"]) is None


def test_parse_path_errors():
    for bad in ("a.b", "$**", "$.", "$[", '$."x'):
        with pytest.raises(ValueError):
            parse_path(bad)


def test_substring_index_scan_direction():
    f = substring_index_py
    assert f("www.pingcap.com", ".", 1) == "www"
    assert f("www.pingcap.com", ".", -2) == "pingcap.com"
    assert f("www.pingcap.com", ".", 100) == "www.pingcap.com"
    # non-overlapping RIGHT scan on repeated delimiters — Spark's
    # builtin disagrees here, which is why the UDF exists
    assert f("www......pingcap....com", "..", -2) == "..com"
    assert f("www......pingcap....com", "..", 3) == "www...."
    assert f("www......pingcap....com", "..", -4) == "..pingcap....com"
    assert f("x", "y", 0) == ""
    assert f("x", "", 5) == ""
    assert f("a", "b", None) is None

"""Function-level column tests — the reference's FunctionTestUtils pattern
(dbms/src/Functions/tests/gtest_*.cpp: column in → column out equality),
covering the shims that have no DuckDB oracle."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tiflash_spark.functions.mysql_compat import (
    mysql_date_format,
    mysql_div,
    mysql_elt,
    mysql_format_to_spark,
    mysql_mod,
)
from tiflash_spark.functions.vector import (
    vec_as_text,
    vec_cosine_distance,
    vec_dims,
    vec_l1_distance,
    vec_l2_distance,
    vec_l2_norm,
)


def one(spark, col, **data):
    df = spark.createDataFrame([Row(**data)]) if data else spark.range(1)
    return df.select(col.alias("r")).collect()[0].r


# --- MySQL date-format token translation ------------------------------------


@pytest.mark.parametrize(
    "mysql,expected",
    [
        ("%Y-%m-%d", "yyyy-MM-dd"),
        ("%H:%i:%s", "HH:mm:ss"),
        ("%d/%m/%y", "dd/MM/yy"),
        ("%W %M %e", "EEEE MMMM d"),
        ("100%%", "100%"),
    ],
)
def test_format_translation(mysql, expected):
    assert mysql_format_to_spark(mysql) == expected


def test_date_format_values(spark):
    r = one(
        spark,
        mysql_date_format(F.lit("1997-03-05 14:09:02").cast("timestamp"), "%Y-%m-%d %H:%i:%s"),
    )
    assert r == "1997-03-05 14:09:02"
    assert one(spark, mysql_date_format(F.lit("1997-03-05").cast("date"), "%W")) == "Wednesday"


# --- MySQL arithmetic NULL rules ---------------------------------------------


def test_div_by_zero_is_null(spark):
    assert one(spark, mysql_div(F.lit(7), F.lit(0))) is None
    assert one(spark, mysql_div(F.lit(7), F.lit(2))) == 3
    assert one(spark, mysql_div(F.lit(-7), F.lit(2))) == -3  # MySQL DIV truncates toward zero


def test_mod_by_zero_is_null(spark):
    assert one(spark, mysql_mod(F.lit(7), F.lit(0))) is None
    assert one(spark, mysql_mod(F.lit(7), F.lit(3))) == 1
    assert one(spark, mysql_mod(F.lit(-7), F.lit(3))) == -1  # sign follows dividend


def test_elt(spark):
    choices = [F.lit("a"), F.lit("b"), F.lit("c")]
    assert one(spark, mysql_elt(F.lit(2), *choices)) == "b"
    assert one(spark, mysql_elt(F.lit(4), *choices)) is None
    assert one(spark, mysql_elt(F.lit(0), *choices)) is None


# --- conv / crc32-ish equivalents exercised natively -------------------------


def test_conv_and_hex(spark):
    assert one(spark, F.conv(F.lit("255"), 10, 16)) == "FF"
    assert one(spark, F.conv(F.lit("ff"), 16, 10)) == "255"
    assert one(spark, F.crc32(F.lit(b"tiflash"))) is not None


# --- vector functions --------------------------------------------------------


VEC = {"a": [1.0, 2.0, 2.0], "b": [1.0, 2.0, 2.0], "c": [3.0, 0.0, 4.0]}


def test_vec_basics(spark):
    df = spark.createDataFrame([Row(a=VEC["a"], b=VEC["b"], c=VEC["c"])])
    r = df.select(
        vec_dims(F.col("a")).alias("d"),
        vec_l2_norm(F.col("a")).alias("n"),
        vec_l2_distance(F.col("a"), F.col("b")).alias("l2_same"),
        vec_l1_distance(F.col("a"), F.col("c")).alias("l1"),
        vec_cosine_distance(F.col("a"), F.col("b")).alias("cos_same"),
        vec_as_text(F.col("a")).alias("txt"),
    ).collect()[0]
    assert r.d == 3
    assert abs(r.n - 3.0) < 1e-12
    assert r.l2_same == 0.0
    assert abs(r.l1 - 6.0) < 1e-12
    assert abs(r.cos_same) < 1e-12
    assert r.txt == "[1.0,2.0,2.0]"


def test_vec_dim_mismatch_is_null(spark):
    df = spark.createDataFrame([Row(a=[1.0, 2.0], b=[1.0, 2.0, 3.0])])
    r = df.select(vec_l2_distance(F.col("a"), F.col("b")).alias("d")).collect()[0]
    assert r.d is None


def test_vec_zero_vector_cosine_null(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 2.0])])
    assert df.select(vec_cosine_distance("a", "b").alias("d")).collect()[0].d is None


def test_mysql_partial_parse(spark):
    from tiflash_spark.functions.mysql_compat import mysql_str_to_int, mysql_str_to_number

    cases = {
        "12abc": 12.0,
        "abc": 0.0,
        " 3.5x": 3.5,
        "-7.25zz": -7.25,
        "1e3km": 1000.0,
        "": 0.0,
        ".5x": 0.5,
        "+42": 42.0,
    }
    for raw, want in cases.items():
        got = one(spark, mysql_str_to_number(F.lit(raw)))
        assert got == want, (raw, got, want)
    assert one(spark, mysql_str_to_int(F.lit("9.9abc"))) == 9
    null_df = spark.createDataFrame([(None,)], "s string")
    assert null_df.select(mysql_str_to_number(F.col("s")).alias("r")).collect()[0].r is None


def test_json_depth_mysql_rule_table(spark):
    """MySQL JSON_DEPTH rules (reference gtest_json_depth cases): scalar or
    empty container = 1; container = 1 + max member depth."""
    from tiflash_spark.functions.json_fns import json_depth

    cases = [
        ('1', 1), ('"abc"', 1), ('{}', 1), ('[]', 1),
        ('{"a":1}', 2), ('[1,2]', 2), ('{"a":{}}', 2), ('[[]]', 2),
        ('{"a":[1]}', 3), ('[1,[2,3]]', 3), ('{"a":{"b":{}}}', 3),
        ('{"a":{"b":[{"c":1}]}}', 5),
        ('{"s":"{[not brackets]}"}', 2),  # braces inside strings ignored
    ]
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc=d) for d, _ in cases])
    got = [r.d for r in df.select(json_depth("doc").alias("d")).collect()]
    assert got == [d for _, d in cases]


def test_json_valid_matches_duckdb_strictness(spark):
    """json_valid agrees with DuckDB/MySQL on every pinned case — in
    particular trailing garbage ('{\"k\":1}}'), which Spark's Jackson-based
    try-parse alone would accept."""
    import duckdb

    from pyspark.sql import Row

    from tiflash_spark.functions.json_fns import json_valid

    cases = [
        '{"k":1}', '{"k":1}}', '{"k":1} x', '{"k":1}{"j":2}', '[1,2]]',
        '{"k":}', '  {"k":1}  ', '{}', '[]', '[[]]', '123', '0123',
        '-1.5e3', '123abc', 'abc', '"a"', '"a', 'true', 'false', 'null',
        '{"s":"}{"}', None,
    ]
    df = spark.createDataFrame([Row(doc=c) for c in cases])
    got = [r.v for r in df.select(json_valid("doc").alias("v")).collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT json_valid(?)", [c]).fetchone()[0] for c in cases
    ]
    assert got == want, list(zip(cases, got, want))


def test_json_object_array_builders(spark):
    from pyspark.sql import functions as F

    from tiflash_spark.functions.json_fns import json_array, json_object, json_unquote

    r = spark.range(1).select(
        json_object(("a", F.lit(1)), ("b", F.lit("x"))).alias("o"),
        json_array(F.lit(1), F.lit(2), F.lit(None).cast("int")).alias("ar"),
        json_unquote(F.lit('"hi"')).alias("u"),
    ).collect()[0]
    assert r.o == '{"a":1,"b":"x"}'
    assert r.ar == "[1,2,null]"
    assert r.u == "hi"


def test_mysql_zero_date_and_unsigned_casts(spark):
    """Zero-date '0000-00-00' → NULL (non-strict tidb_cast); unsigned cast
    wraps negatives mod 2^64 and signed cast wraps back (reference
    FunctionsTiDBConversion.cpp)."""
    from decimal import Decimal

    from pyspark.sql import Row, functions as F

    from tiflash_spark.functions.mysql_compat import (
        is_zero_date,
        mysql_cast_signed,
        mysql_cast_unsigned,
        mysql_str_to_date,
    )

    df = spark.createDataFrame(
        [Row(s="0000-00-00", x=-1), Row(s="1996-06-15", x=5),
         Row(s="0000-00-00 00:00:00", x=-9223372036854775808),
         Row(s="garbage", x=0)]
    )
    out = df.select(
        mysql_str_to_date("s").alias("d"),
        is_zero_date("s").alias("z"),
        mysql_cast_unsigned("x").alias("u"),
        mysql_cast_signed(mysql_cast_unsigned("x")).alias("rt"),
    ).collect()
    assert [r.d is None for r in out] == [True, False, True, True]
    assert [r.z for r in out] == [True, False, True, False]
    assert out[0].u == Decimal("18446744073709551615")
    assert out[2].u == Decimal("9223372036854775808")
    assert out[3].u == Decimal(0)
    # unsigned→signed round-trips to the original two's-complement value
    assert [r.rt for r in out] == [-1, 5, -9223372036854775808, 0]


def test_mysql_sql_function_registry(spark):
    """MySQL-named SQL UDF surface (Catalyst-inlined, no Python in the
    plan): DIV NULL-on-zero, JSON_DEPTH recursion rule, zero-date cast,
    unsigned wrap, inet round-trip."""
    from tiflash_spark.functions.sql_registry import register_mysql_functions

    register_mysql_functions(spark)
    r = spark.sql(
        "SELECT mysql_div(7, 2) AS d, mysql_div(7, 0) AS dz,"
        " json_depth('{\"a\":[1,[2]]}') AS jd, json_depth('{}') AS jd0,"
        " json_unquote('\"hi\"') AS ju,"
        " mysql_str_to_date('0000-00-00') AS zd,"
        " cast_unsigned(-1) AS u,"
        " inet_ntoa(inet_aton('10.0.0.255')) AS ip,"
        " sec_to_time(3661) AS st, mysql_format(1234567.891, 2) AS fmt"
    ).collect()[0]
    assert (r.d, r.dz) == (3, None)
    assert (r.jd, r.jd0) == (4, 1)
    assert r.ju == "hi"
    assert r.zd is None
    assert str(r.u) == "18446744073709551615"
    assert r.ip == "10.0.0.255"
    assert (r.st, r.fmt) == ("01:01:01", "1,234,567.89")
    # SQL UDFs must inline — no BatchEvalPython/ArrowEvalPython in the plan
    plan = spark.sql("SELECT json_depth(props) FROM (SELECT '{\"k\":1}' AS props)")
    assert "Python" not in plan._jdf.queryExecution().executedPlan().toString()


def test_mysql_date_format_iso_week_tokens(spark):
    """%v/%x ISO week tokens (MySQL week mode 3): year boundary weeks land
    in the adjacent ISO year — 2021-01-01 is 2020-W53; 2024-12-30 is
    2025-W01."""
    from pyspark.sql import Row, functions as F

    from tiflash_spark.functions.mysql_compat import mysql_date_format

    df = spark.createDataFrame(
        [Row(d="2021-01-01"), Row(d="2024-12-30"), Row(d="1996-06-15")]
    ).select(F.col("d").cast("date").alias("d"))
    out = [r.s for r in df.select(mysql_date_format("d", "%x-W%v (%Y-%m-%d)").alias("s")).collect()]
    assert out == [
        "2020-W53 (2021-01-01)",
        "2025-W01 (2024-12-30)",
        "1996-W24 (1996-06-15)",
    ]


def test_open_catalog_sql_complete_session(spark):
    """open_catalog: tables + MySQL function names usable purely via
    spark.sql — the reference user's TiDB-SQL driving model."""
    import tiflash_spark

    tiflash_spark.open_catalog(spark, "/root/testdata/sf0.001")
    row = spark.sql(
        """
        SELECT mysql_div(SUM(l_quantity), 10) AS q10,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        """
    ).collect()[0]
    assert row.n > 0 and row.q10 is not None
    assert spark.sql("SELECT COUNT(*) AS n FROM partsupp").collect()[0].n > 0


def test_sql_vector_surface(spark):
    """The VEC_* SQL names TiDB exposes (FunctionsVector.cpp; driven from
    SQL in fullstack-test-index/vector/distance.test): registered by
    open_catalog, usable in ORDER BY ... LIMIT, soft-NULL on dim
    mismatch and zero-vector cosine."""
    from tiflash_spark.functions.sql_registry import register_mysql_functions

    register_mysql_functions(spark)
    [r] = spark.sql(
        "SELECT VEC_DIMS(VEC_FROM_TEXT('[1.0, 4.0, 8.0, 7.0, 6.0]')) AS d,"
        " VEC_AS_TEXT(VEC_FROM_TEXT('[1.5,2.0]')) AS t,"
        " ROUND(VEC_L2_DISTANCE(array(0D, 3D), array(4D, 0D)), 4) AS l2,"
        " ROUND(VEC_L1_DISTANCE(array(0D, 3D), array(4D, 0D)), 4) AS l1,"
        " ROUND(VEC_COSINE_DISTANCE(array(1D, 0D), array(0D, 1D)), 4) AS cd,"
        " VEC_NEGATIVE_INNER_PRODUCT(array(1D, 2D), array(3D, 4D)) AS nip,"
        " ROUND(VEC_L2_NORM(array(3D, 4D)), 4) AS nrm,"
        " VEC_L2_DISTANCE(array(1D), array(1D, 2D)) AS mismatch,"
        " VEC_COSINE_DISTANCE(array(0D, 0D), array(1D, 0D)) AS zerovec"
    ).collect()
    assert (r.d, r.t) == (5, "[1.5,2.0]")
    assert (r.l2, r.l1, r.cd, r.nip, r.nrm) == (5.0, 7.0, 1.0, -11.0, 5.0)
    assert r.mismatch is None and r.zerovec is None


# --- live-map stragglers: TO_DAYS family, TRUNCATE, shifts, XOR, IS TRUE ----


def test_to_days_from_days_roundtrip(spark):
    """TO_DAYS matches proleptic-Gregorian ordinal + 365 (the MySQL year-0
    day count: TO_DAYS('1970-01-01') = 719528); FROM_DAYS inverts it."""
    import datetime as dt

    from tiflash_spark.functions.mysql_compat import (
        mysql_from_days,
        mysql_to_days,
    )

    dates = ["1970-01-01", "2007-10-07", "1997-06-30", "2000-02-29"]
    df = spark.createDataFrame([(d,) for d in dates], "d string").select(
        "d",
        mysql_to_days(F.col("d").cast("date")).alias("td"),
        mysql_from_days(mysql_to_days(F.col("d").cast("date"))).alias("back"),
    )
    for r in df.collect():
        want = dt.date.fromisoformat(r.d).toordinal() + 365
        assert r.td == want, r
        assert r.back == dt.date.fromisoformat(r.d), r
    # MySQL documents FROM_DAYS only for n >= 366 -> NULL below
    low = spark.range(1).select(mysql_from_days(F.lit(365)).alias("x")).first()
    assert low.x is None


def test_to_seconds_and_microsecond(spark):
    from tiflash_spark.functions.mysql_compat import (
        mysql_microsecond,
        mysql_to_seconds,
    )

    r = (
        spark.createDataFrame(
            [("2009-11-29 13:43:32.000012",)], "t string"
        )
        .select(
            mysql_to_seconds(F.col("t")).alias("ts"),
            mysql_microsecond(F.col("t")).alias("us"),
        )
        .first()
    )
    import datetime as dt

    want = (dt.date(2009, 11, 29).toordinal() + 365) * 86400 + 13 * 3600 + 43 * 60 + 32
    assert r.ts == want
    assert r.us == 12


def test_truncate_directions(spark):
    from tiflash_spark.functions.misc import mysql_truncate

    rows = (
        spark.createDataFrame(
            [(1.223,), (1.999,), (-1.999,), (122.0,), (10.28,)], "x double"
        )
        .select(
            F.col("x"),
            mysql_truncate(F.col("x"), 1).alias("t1"),
            mysql_truncate(F.col("x"), -2).alias("tm2"),
        )
        .collect()
    )
    got = {round(r.x, 3): (round(r.t1, 1), r.tm2) for r in rows}
    # MySQL doc examples: TRUNCATE(1.223,1)=1.2, TRUNCATE(1.999,1)=1.9,
    # TRUNCATE(-1.999,1)=-1.9, TRUNCATE(122,-2)=100, TRUNCATE(10.28,0)=10
    assert got[1.223] == (1.2, 0.0)
    assert got[1.999] == (1.9, 0.0)
    assert got[-1.999] == (-1.9, -0.0)
    assert got[122.0] == (122.0, 100.0)


def test_shift_unsigned_semantics(spark):
    from tiflash_spark.functions.misc import mysql_shiftleft, mysql_shiftright

    r = spark.range(1).select(
        mysql_shiftleft(F.lit(1), 63).cast("string").alias("hi"),
        mysql_shiftleft(F.lit(1), 64).cast("string").alias("over"),
        mysql_shiftleft(F.lit(4), 62).cast("string").alias("wrap"),
        mysql_shiftright(F.lit(-1), 60).cast("string").alias("neg_rs"),
        mysql_shiftright(F.lit(16), 2).cast("string").alias("plain"),
    ).first()
    assert r.hi == "9223372036854775808"  # 1<<63 presented unsigned
    assert r.over == "0"  # count >= 64 -> 0 (MySQL)
    assert r.wrap == "0"  # 4<<62 wraps mod 2^64
    assert r.neg_rs == str(((1 << 64) - 1) >> 60)  # logical shift of -1
    assert r.plain == "4"


def test_xor_is_true_is_false(spark):
    from tiflash_spark.functions.misc import is_false, is_true, logical_xor

    r = (
        spark.createDataFrame([(1, 0, None)], "a int, b int, c int")
        .select(
            logical_xor(F.col("a"), F.col("b")).alias("x_ab"),
            logical_xor(F.col("a"), F.col("a")).alias("x_aa"),
            logical_xor(F.col("a"), F.col("c")).alias("x_null"),
            is_true(F.col("c")).alias("t_null"),
            is_true(F.col("c"), with_null=True).alias("t_null_wn"),
            is_false(F.col("b")).alias("f_zero"),
        )
        .first()
    )
    assert (r.x_ab, r.x_aa, r.x_null) == (1, 0, None)
    assert (r.t_null, r.t_null_wn, r.f_zero) == (0, None, 1)


def test_get_format_and_duration_extract(spark):
    from tiflash_spark.functions.misc import extract_duration
    from tiflash_spark.functions.mysql_compat import mysql_get_format

    r = (
        spark.createDataFrame([("USA",), ("ISO",), ("nope",)], "loc string")
        .select("loc", mysql_get_format("DATE", F.col("loc")).alias("fmt"))
        .collect()
    )
    got = {x.loc: x.fmt for x in r}
    assert got == {"USA": "%m.%d.%Y", "ISO": "%Y-%m-%d", "nope": None}

    ns = (11 * 3600 + 22 * 60 + 33) * 1_000_000_000 + 123_456_000
    d = spark.createDataFrame([(ns,)], "d long").select(
        extract_duration("HOUR", F.col("d")).alias("h"),
        extract_duration("MINUTE", F.col("d")).alias("m"),
        extract_duration("SECOND", F.col("d")).alias("s"),
        extract_duration("MICROSECOND", F.col("d")).alias("us"),
        extract_duration("HOUR_MINUTE", F.col("d")).alias("hm"),
        extract_duration("MINUTE_SECOND", F.col("d")).alias("ms"),
    ).first()
    assert (d.h, d.m, d.s, d.us) == (11, 22, 33, 123456)
    assert (d.hm, d.ms) == (1122, 2233)
    neg = spark.createDataFrame([(-ns,)], "d long").select(
        extract_duration("HOUR_MINUTE", F.col("d")).alias("hm")
    ).first()
    assert neg.hm == -1122


def test_sql_straggler_surface(spark):
    from tiflash_spark.functions.sql_registry import register_mysql_functions

    register_mysql_functions(spark)
    r = spark.sql(
        "SELECT to_days(DATE '2007-10-07') AS td,"
        " from_days(to_days(DATE '2007-10-07')) AS fd,"
        " to_seconds(TIMESTAMP '2009-11-29 13:43:32') AS ts,"
        " mysql_truncate(1.999D, 1) AS tr,"
        " mysql_xor(1, 0) AS x"
    ).first()
    import datetime as dt

    assert r.td == dt.date(2007, 10, 7).toordinal() + 365
    # SQL-surface from_days renders MySQL-style (STRING, zero-date aware)
    assert r.fd == "2007-10-07"
    import datetime as dt2

    assert r.ts == (dt2.date(2009, 11, 29).toordinal() + 365) * 86400 + 13 * 3600 + 43 * 60 + 32
    assert abs(r.tr - 1.9) < 1e-12
    assert r.x == 1


def test_json_keys_with_path(spark):
    """JSON_KEYS(doc, path) — the live map's json_keys_2_args."""
    from tiflash_spark.functions.json_fns import json_keys_at

    r = (
        spark.createDataFrame(
            [('{"a": {"x": 1, "y": 2}, "b": [1], "c": 3}',)], "doc string"
        )
        .select(
            json_keys_at("doc", "$.a").alias("ka"),
            json_keys_at("doc", "$.b").alias("kb"),
            json_keys_at("doc", "$.missing").alias("km"),
        )
        .first()
    )
    assert r.ka == ["x", "y"]
    assert r.kb is None  # array, not an object
    assert r.km is None
    from tiflash_spark.functions.sql_registry import register_mysql_functions

    register_mysql_functions(spark)
    q = spark.sql(
        "SELECT json_keys_at('{\"a\": {\"x\": 1}}', '$.a') AS k"
    ).first()
    assert q.k == ["x"]


def test_json_cast_family(spark):
    """CAST(... AS JSON) renderings (live-map cast_*_as_json)."""
    from tiflash_spark.functions.json_fns import (
        json_from_duration,
        json_from_number,
        json_from_string,
        json_from_time,
    )

    r = (
        spark.createDataFrame(
            [(5, 2.5, '{"a": 1}', "notjson", "2024-03-01 10:20:30")],
            "i int, d double, good string, bad string, t string",
        )
        .select(
            json_from_number(F.col("i")).alias("ji"),
            json_from_number(F.col("d")).alias("jd"),
            json_from_string(F.col("good")).alias("jg"),
            json_from_string(F.col("bad")).alias("jb"),
            json_from_time(F.col("t"), fsp=0).alias("jt"),
            json_from_duration(F.lit(3_723_000_000_000)).alias("jdur"),
        )
        .first()
    )
    assert r.ji == "5" and r.jd == "2.5"
    assert r.jg == '{"a": 1}' and r.jb is None
    assert r.jt == '"2024-03-01 10:20:30"'
    assert r.jdur == '"01:02:03"'


def test_two_arg_log(spark):
    from tiflash_spark.functions.mysql_compat import mysql_log

    r = (
        spark.createDataFrame(
            [(2.0, 8.0), (10.0, 1000.0), (1.0, 5.0), (2.0, -1.0), (0.0, 9.0)],
            "b double, x double",
        )
        .select(F.round(mysql_log(F.col("b"), F.col("x")), 9).alias("v"))
        .collect()
    )
    vals = [x.v for x in r]
    assert vals[0] == 3.0 and vals[1] == 3.0
    assert vals[2] is None and vals[3] is None and vals[4] is None


def test_div_precision_increment_goldens(spark):
    """Port of set_variable_div_precision_increment.test: result scale =
    dividend scale + increment (default 4), HALF_UP — the reference's
    golden tables at increments 4 and 5."""
    from decimal import Decimal

    from tiflash_spark.functions.mysql_compat import (
        mysql_avg_decimal,
        mysql_decimal_divide,
    )

    df = spark.createDataFrame(
        [(Decimal("11.2"), Decimal("3")), (Decimal("10.1"), Decimal("3")),
         (Decimal("13.7"), Decimal("3"))],
        "a decimal(3,1), b decimal(3,0)",
    )
    got4 = sorted(
        str(r.q) for r in df.select(
            mysql_decimal_divide("a", "b", a_scale=1).alias("q")
        ).collect()
    )
    assert got4 == ["3.36667", "3.73333", "4.56667"]
    got5 = sorted(
        str(r.q) for r in df.select(
            mysql_decimal_divide("a", "b", a_scale=1, increment=5).alias("q")
        ).collect()
    )
    assert got5 == ["3.366667", "3.733333", "4.566667"]
    avg4 = df.groupBy("b").agg(mysql_avg_decimal("a", 1).alias("m")).first()
    assert str(avg4.m) == "11.66667"
    avg5 = df.groupBy("b").agg(
        mysql_avg_decimal("a", 1, increment=5).alias("m")
    ).first()
    assert str(avg5.m) == "11.666667"
    # zero divisor -> NULL
    z = spark.createDataFrame(
        [(Decimal("1.0"), Decimal("0"))], "a decimal(3,1), b decimal(3,0)"
    ).select(mysql_decimal_divide("a", "b", 1).alias("q")).first()
    assert z.q is None

"""Misc function tests: IP, duration, unsigned widening, bit — the
FIXTURES.md group B (types_all) surface, column-in/column-out style."""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tiflash_spark.functions.misc import (
    export_set,
    inet_aton,
    inet_ntoa,
    is_ipv4,
    is_ipv6,
    sec_to_time_str,
    time_to_sec,
    uint64_to_decimal,
)


def col_out(spark, expr, **data):
    return spark.createDataFrame([Row(**data)]).select(expr.alias("r")).collect()[0].r


@pytest.mark.parametrize(
    "s,v4,v6",
    [
        ("1.2.3.4", True, False),
        ("255.255.255.255", True, False),
        ("256.1.1.1", False, False),
        ("1.2.3", False, False),
        ("::1", False, True),
        ("2001:db8::ff00:42:8329", False, True),
        ("not-an-ip", False, False),
    ],
)
def test_ip_classify(spark, s, v4, v6):
    assert col_out(spark, is_ipv4(F.col("s")), s=s) is v4
    assert col_out(spark, is_ipv6(F.col("s")), s=s) is v6


def test_inet_roundtrip(spark):
    assert col_out(spark, inet_aton(F.col("s")), s="192.168.1.10") == 3232235786
    assert col_out(spark, inet_ntoa(F.col("n")), n=3232235786) == "192.168.1.10"
    assert col_out(spark, inet_aton(F.col("s")), s="999.1.1.1") is None
    assert col_out(spark, inet_ntoa(F.col("n")), n=-5) is None
    # roundtrip on corners
    for ip in ("0.0.0.0", "255.255.255.255", "10.0.0.1"):
        n = col_out(spark, inet_aton(F.col("s")), s=ip)
        assert col_out(spark, inet_ntoa(F.col("n")), n=n) == ip


def test_duration(spark):
    ns = 2 * 3_600_000_000_000 + 25 * 60_000_000_000 + 9_000_000_000  # 02:25:09
    assert col_out(spark, time_to_sec(F.col("d")), d=ns) == 2 * 3600 + 25 * 60 + 9
    assert col_out(spark, sec_to_time_str(F.col("s")), s=8709) == "02:25:09"
    assert col_out(spark, sec_to_time_str(F.col("s")), s=-61) == "-00:01:01"
    assert col_out(spark, sec_to_time_str(F.col("s")), s=90061) == "25:01:01"


def test_uint64_widening(spark):
    assert col_out(spark, uint64_to_decimal(F.col("n")), n=5) == Decimal(5)
    # -1 as two's-complement == 2^64 - 1
    assert col_out(spark, uint64_to_decimal(F.col("n")), n=-1) == Decimal(
        18446744073709551615
    )
    assert col_out(spark, uint64_to_decimal(F.col("n")), n=-(2**63)) == Decimal(2**63)


def test_export_set(spark):
    assert col_out(spark, export_set(F.col("b"), n=4), b=5) == "1,0,1,0"
    assert col_out(spark, export_set(F.col("b"), "Y", "N", "|", 4), b=9) == "Y|N|N|Y"


def test_enum_name(spark):
    from tiflash_spark.functions.misc import enum_name

    names = ["red", "green", "blue"]
    assert col_out(spark, enum_name(F.col("o"), names), o=2) == "green"
    assert col_out(spark, enum_name(F.col("o"), names), o=0) is None
    assert col_out(spark, enum_name(F.col("o"), names), o=9) is None


def test_set_to_array(spark):
    from tiflash_spark.functions.misc import set_to_array

    names = ["a", "b", "c", "d"]
    assert col_out(spark, set_to_array(F.col("m"), names), m=0b1011) == ["a", "b", "d"]
    assert col_out(spark, set_to_array(F.col("m"), names), m=0) == []


def test_find_in_set(spark):
    from tiflash_spark.functions.misc import find_in_set

    assert col_out(spark, find_in_set(F.lit("b"), F.col("c")), c="a,b,c") == 2
    assert col_out(spark, find_in_set(F.lit("z"), F.col("c")), c="a,b,c") == 0
    null_df = spark.createDataFrame([(None,)], "c string")
    assert null_df.select(find_in_set(F.lit("b"), F.col("c")).alias("r")).collect()[0].r is None


def test_mysql_format(spark):
    from tiflash_spark.functions.misc import mysql_format

    assert col_out(spark, mysql_format(F.col("n"), 2), n=1234567.891) == "1,234,567.89"
    assert col_out(spark, mysql_format(F.col("n"), 0), n=1234.5) == "1,235"


def _ref_ntoa(b: bytes) -> str:
    """Expected INET6_NTOA text per the reference formatIPv6.cpp:139
    (= MySQL inet_ntop): Python's ipaddress canonical form EXCEPT the
    dotted-quad tails — IPv4-mapped always, IPv4-compatible only when
    word6 != 0."""
    import ipaddress

    words = [int.from_bytes(b[i : i + 2], "big") for i in range(0, 16, 2)]
    quad = ".".join(str(x) for x in b[12:16])
    if words[:5] == [0] * 5 and words[5] == 0xFFFF:
        return f"::ffff:{quad}"
    if words[:6] == [0] * 6 and words[6] != 0:
        return f"::{quad}"
    return str(ipaddress.IPv6Address(b))


def test_inet6_roundtrip_known_forms(spark):
    """INET6_ATON/NTOA (reference tiDBIPv6StringToNum/NumToString):
    packed bytes and canonical compression vs Python's ipaddress."""
    import ipaddress

    from pyspark.sql import functions as F

    from tiflash_spark.functions.misc import inet6_aton, inet6_ntoa

    cases = [
        "::1", "::", "fe80::", "2001:db8::8a2e:370:7334",
        "1:0:0:2:0:0:3:4", "0:0:1:2:3:4:5:6", "1:2:3:4:5:6:0:0",
        "::ffff:1.2.3.4", "2001:0db8:0000:0000:0000:ff00:0042:8329",
        "abcd:ef01:2345:6789:abcd:ef01:2345:6789", "1.2.3.4", "255.255.255.255",
    ]
    rows = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", inet6_aton(F.col("s")).alias("b"))
        .select("s", "b", inet6_ntoa(F.col("b")).alias("t"))
        .collect()
    )
    for r in rows:
        assert bytes(r.b) == ipaddress.ip_address(r.s).packed, r.s
        want = _ref_ntoa(bytes(r.b)) if ":" in r.s else r.s
        assert r.t == want, (r.s, r.t, want)


def test_inet6_random_addresses_match_ipaddress(spark):
    import ipaddress
    import random

    from pyspark.sql import functions as F

    from tiflash_spark.functions.misc import inet6_aton, inet6_ntoa

    rng = random.Random(20260814)
    addrs = []
    for _ in range(60):
        # biased toward zero groups so compression paths are exercised
        groups = [
            0 if rng.random() < 0.5 else rng.randrange(0x10000) for _ in range(8)
        ]
        addrs.append(str(ipaddress.IPv6Address(bytes(
            b for g in groups for b in divmod(g, 256)
        ))))
    rows = (
        spark.createDataFrame([(a,) for a in addrs], "s string")
        .select("s", inet6_aton(F.col("s")).alias("b"))
        .select("s", "b", inet6_ntoa(F.col("b")).alias("t"))
        .collect()
    )
    for r in rows:
        assert bytes(r.b) == ipaddress.ip_address(r.s).packed, r.s
        assert r.t == _ref_ntoa(bytes(r.b)), (r.s, r.t)


def test_inet6_malformed_is_null(spark):
    from pyspark.sql import functions as F

    from tiflash_spark.functions.misc import inet6_aton, inet6_ntoa

    bad = ["", "1:::2", "g::1", "1:2:3:4:5:6:7:8:9", "1:2", "300.1.2.3"]
    rows = (
        spark.createDataFrame([(b,) for b in bad], "s string")
        .select(inet6_aton(F.col("s")).alias("b"))
        .collect()
    )
    assert all(r.b is None for r in rows)
    # NTOA of a wrong-length binary is NULL
    r = spark.range(1).select(
        inet6_ntoa(F.unhex(F.lit("0a0b0c"))).alias("t")
    ).first()
    assert r.t is None


def test_inet6_mapped_v4_tail_octets_validated(spark):
    """'::ffff:999.1.1.1' must be NULL (MySQL): without per-octet <=255
    validation the packed number exceeds 2^32 and the hex truncation
    fabricates a well-formed but wrong 16-byte value."""
    from pyspark.sql import functions as F

    from tiflash_spark.functions.misc import inet6_aton, inet6_ntoa

    bad = ["::ffff:999.1.1.1", "::ffff:1.256.1.1", "::ffff:1.1.1.300"]
    rows = (
        spark.createDataFrame([(b,) for b in bad], "s string")
        .select(inet6_aton(F.col("s")).alias("b"))
        .collect()
    )
    assert all(r.b is None for r in rows)
    # boundary and edge renderings match the reference formatIPv6 rule
    cases = {
        "::ffff:255.255.255.255": "::ffff:255.255.255.255",
        "::1.2.3.4": "::1.2.3.4",   # v4-compat, word6 != 0 -> quad
        "::0.0.5.9": "::509",        # word6 == 0 -> hex run
        "::2": "::2",
        "::1": "::1",
    }
    rows = (
        spark.createDataFrame([(s,) for s in cases], "s string")
        .select("s", inet6_ntoa(inet6_aton(F.col("s"))).alias("t"))
        .collect()
    )
    for r in rows:
        assert r.t == cases[r.s], (r.s, r.t)

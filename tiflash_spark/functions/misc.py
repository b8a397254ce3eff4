"""Misc MySQL function surface: IP address, duration (MySQL TIME), bit,
unsigned widening (SURVEY.md §1.2, §2.4 IP/misc rows).

Reference impls: dbms/src/Functions/FunctionsCoding.cpp (inet_aton/ntoa,
hex/bin), FunctionsIsIPAddr.cpp (isIPv4/isIPv6), DataTypeMyDuration.h
(TIME as Int64 nanoseconds), TiDBTypes.h UInt64→wider-type rule.

All pure Column expressions (codegen-friendly); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- IPv4 -------------------------------------------------------------------

_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])$"
)
# colon-separated hex groups; pragmatic check like the reference's parser
_IPV6_RE = r"^([0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}$"


def is_ipv4(s: Column) -> Column:
    """MySQL IS_IPV4 (reference dbms/src/Functions/FunctionsIsIPAddr.cpp)."""
    return s.rlike(_IPV4_RE)


def is_ipv6(s: Column) -> Column:
    return (~is_ipv4(s)) & s.rlike(_IPV6_RE)


def inet_aton(s: Column) -> Column:
    """dotted-quad → number; NULL for malformed input (MySQL semantics)."""
    parts = F.split(s, r"\.")
    num = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(is_ipv4(s), num)


def inet_ntoa(n: Column) -> Column:
    """number → dotted-quad; NULL out of range."""
    oct1 = (n / 16777216).cast("long") % 256
    oct2 = (n / 65536).cast("long") % 256
    oct3 = (n / 256).cast("long") % 256
    oct4 = n.cast("long") % 256
    return F.when(
        (n >= 0) & (n <= 4294967295),
        F.concat_ws(".", oct1.cast("string"), oct2.cast("string"), oct3.cast("string"), oct4.cast("string")),
    )


# --- MySQL TIME / duration (Int64 nanoseconds) ------------------------------


def time_to_sec(dur_ns: Column) -> Column:
    """MySQL TIME_TO_SEC over the engine's Int64-nanosecond duration
    encoding (DataTypeMyDuration.h). Truncates toward zero like MySQL."""
    return (dur_ns / 1_000_000_000).cast("long")


def sec_to_time_str(seconds: Column) -> Column:
    """MySQL SEC_TO_TIME rendered as 'HH:MM:SS' (can exceed 24 h)."""
    total = seconds.cast("long")
    sign = F.when(total < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(total)
    h = (a / 3600).cast("long")
    m = ((a % 3600) / 60).cast("long")
    s = a % 60
    return F.concat(
        sign,
        F.lpad(h.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(s.cast("string"), 2, "0"),
    )


def duration_hours(dur_ns: Column) -> Column:
    return (dur_ns / 3_600_000_000_000).cast("long")


# --- unsigned widening (§1.2) -----------------------------------------------


def uint64_to_decimal(n: Column) -> Column:
    """TiDB UInt64 surfaces as Decimal(20,0) in Spark (no unsigned 64-bit
    type); negative raw longs are the two's-complement upper half."""
    two_pow_64 = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
    return (
        F.when(n >= 0, n.cast("decimal(20,0)"))
        .otherwise((n.cast("decimal(21,0)") + two_pow_64).cast("decimal(20,0)"))
    )


# --- bit --------------------------------------------------------------------


def bit_to_long(b: Column) -> Column:
    """MySQL BIT(n) as UInt64 (TiDBTypes.h tag 16)."""
    return b.cast("long")


def export_set(bits: Column, on: str = "1", off: str = "0", sep: str = ",", n: int = 8) -> Column:
    """MySQL EXPORT_SET over the low n bits."""
    parts = [
        F.when(F.shiftright(bits, i).bitwiseAND(F.lit(1)) == 1, F.lit(on)).otherwise(F.lit(off))
        for i in range(n)
    ]
    return F.concat_ws(sep, *parts)


# --- MySQL ENUM / SET surface (§1.2: Enum16, Set = UInt64 bitmask) ----------


def enum_name(ordinal: Column, names: list[str]) -> Column:
    """ENUM ordinal (1-based, MySQL style) → label; NULL out of range.
    Reference surfaces Enum as Enum16 (DataTypeEnum.h); here the dictionary
    is explicit, like a broadcast dimension."""
    expr = F.lit(None)
    for i in range(len(names), 0, -1):
        expr = F.when(ordinal == i, F.lit(names[i - 1])).otherwise(expr)
    return expr


def set_to_array(mask: Column, names: list[str]) -> Column:
    """SET bitmask (UInt64, TiDBTypes.h tag 0xf8) → array of member names."""
    members = [
        F.when(F.shiftright(mask, i).bitwiseAND(F.lit(1)) == 1, F.lit(n))
        for i, n in enumerate(names)
    ]
    return F.array_compact(F.array(*members))


def find_in_set(needle: Column, csv: Column) -> Column:
    """MySQL FIND_IN_SET: 1-based position of needle in 'a,b,c', 0 if absent."""
    arr = F.split(csv, ",")
    pos = F.array_position(arr, needle)
    return F.when(needle.isNull() | csv.isNull(), F.lit(None)).otherwise(pos.cast("int"))


def mysql_format(n: Column, decimals: int) -> Column:
    """MySQL FORMAT(n, d): thousands separators + fixed decimals
    (reference FunctionsString.cpp format). format_number alone rounds
    half-even; MySQL rounds half-up — pre-round with F.round (HALF_UP)."""
    return F.format_number(F.round(n, decimals), decimals)

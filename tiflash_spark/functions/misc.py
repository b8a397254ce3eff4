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


def mysql_truncate(x: Column | str, d: int) -> Column:
    """TRUNCATE(X, D) (reference tidbTruncateWithFrac, FunctionsRound.cpp):
    truncation toward zero to D fractional digits; negative D zeroes digits
    left of the decimal point. Differs from ROUND (no half-away) and from
    FLOOR (which goes toward -inf for negatives)."""
    col = F.col(x) if isinstance(x, str) else x
    if d >= 0:
        scale = F.lit(float(10**d))
        return F.signum(col) * F.floor(F.abs(col) * scale) / scale
    # negative D: DIVIDE by the exact power of ten — multiplying by the
    # inexact reciprocal (0.1…) rounds values like 999999.9999999999 UP
    # across the floor boundary (hypothesis-found)
    scale = F.lit(float(10 ** (-d)))
    return F.signum(col) * F.floor(F.abs(col) / scale) * scale


def logical_xor(a: Column, b: Column) -> Column:
    """MySQL XOR (reference `xor` in the live map): NULL if either side is
    NULL, else (a != 0) != (b != 0) as 1/0."""
    return ((a.cast("double") != 0) != (b.cast("double") != 0)).cast("int")


def is_true(x: Column | str, with_null: bool = False) -> Column:
    """IS TRUE (reference isTrue/isTrueWithNull): nonzero -> 1, zero -> 0;
    NULL -> 0 for IS TRUE, NULL for the WithNull variant (used inside
    expressions where NULL must propagate)."""
    col = (F.col(x) if isinstance(x, str) else x).cast("double")
    flag = (col != 0).cast("int")
    return flag if with_null else F.coalesce(flag, F.lit(0))


def is_false(x: Column | str, with_null: bool = False) -> Column:
    """IS FALSE (reference isFalse/isFalseWithNull)."""
    col = (F.col(x) if isinstance(x, str) else x).cast("double")
    flag = (col == 0).cast("int")
    return flag if with_null else F.coalesce(flag, F.lit(0))


def mysql_shiftleft(x: Column | str, n: Column | int) -> Column:
    """x << n with MySQL BIGINT UNSIGNED semantics (reference bitShiftLeft):
    the result wraps modulo 2^64 and is presented unsigned (DECIMAL(20,0)
    via uint64_to_decimal); shift counts outside 0..63 yield 0."""
    col = (F.col(x) if isinstance(x, str) else x).cast("long")
    nn = F.lit(n) if isinstance(n, int) else n.cast("int")
    shifted = uint64_to_decimal(F.call_function("shiftleft", col, nn))
    return F.when((nn < 0) | (nn > 63), F.lit(0).cast("decimal(20,0)")).otherwise(
        shifted
    )


def mysql_shiftright(x: Column | str, n: Column | int) -> Column:
    """x >> n, logical (unsigned) shift like MySQL (reference bitShiftRight):
    the sign bit shifts in as 0 — Spark's shiftrightunsigned — and counts
    outside 0..63 yield 0."""
    col = (F.col(x) if isinstance(x, str) else x).cast("long")
    nn = F.lit(n) if isinstance(n, int) else n.cast("int")
    shifted = uint64_to_decimal(F.call_function("shiftrightunsigned", col, nn))
    return F.when((nn < 0) | (nn > 63), F.lit(0).cast("decimal(20,0)")).otherwise(
        shifted
    )


def extract_duration(unit: str, dur_ns: Column | str) -> Column:
    """EXTRACT(unit FROM duration) (reference extractMyDuration,
    FunctionsDuration.cpp) over the repo's Int64-nanosecond duration
    encoding. Negative durations extract negative components, as MySQL
    does for TIME values."""
    col = (F.col(dur_ns) if isinstance(dur_ns, str) else dur_ns).cast("long")
    sign = F.when(col < 0, F.lit(-1)).otherwise(F.lit(1))
    a = F.abs(col)
    hour = (a / 3_600_000_000_000).cast("long")
    minute = (a / 60_000_000_000).cast("long") % 60
    second = (a / 1_000_000_000).cast("long") % 60
    micro = (a / 1_000).cast("long") % 1_000_000
    table = {
        "HOUR": hour,
        "MINUTE": minute,
        "SECOND": second,
        "MICROSECOND": micro,
        "SECOND_MICROSECOND": second * 1_000_000 + micro,
        "MINUTE_SECOND": minute * 100 + second,
        "MINUTE_MICROSECOND": (minute * 100 + second) * 1_000_000 + micro,
        "HOUR_SECOND": hour * 10_000 + minute * 100 + second,
        "HOUR_MINUTE": hour * 100 + minute,
        "HOUR_MICROSECOND": (hour * 10_000 + minute * 100 + second) * 1_000_000
        + micro,
    }
    if unit.upper() not in table:
        raise ValueError(f"unsupported duration unit {unit!r}")
    return (sign * table[unit.upper()]).cast("long")

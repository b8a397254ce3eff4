"""Common-handle (clustered index) key encoding.

Reference: a TiDB table with a clustered (non-int) primary key stores the
memcomparable-encoded PK bytes as the row handle — TiFlash carries it
through DeltaMerge as the "common handle" instead of the int64
``_tidb_rowid`` (decode side dbms/src/Storages/KVStore/Decode/
RegionBlockReader.h, `is_common_handle` plumbing throughout
dbms/src/Storages/DeltaMerge/; e2e suite
tests/fullstack-test2/clustered_index/).

Spark-first: the handle stays ONE sortable column (here a string), produced
by an order-preserving encoding of the PK tuple, so every DeltaStore
mechanism — window dedup, hash segments, range-segment manifests with
lexicographic bounds — works unchanged on clustered-index tables.

Encoding (order-preserving over tuples of int64 and string fields):
- int64  → 16 uppercase hex digits of the sign-biased value, as two
  32-bit halves (hi gets +2^31, both zero-padded to 8) — fixed width, so
  lexicographic order == numeric order.
- string → NUL-escaped (0x00 → 0x00 0xFF) + 0x00 terminator, the
  FoundationDB-tuple scheme: a shorter string sorts before any extension
  of it, and embedded NULs cannot forge a terminator. Comparison is by
  UTF-8 bytes == code points, matching Spark's binary string ordering.

Both engines' orderings agree for the encoded column, so snapshot reads,
range pruning and segment split/merge are deterministic on composite keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIAS32 = 2_147_483_648  # 2^31: sign bias for the high half
_LOW32 = 4_294_967_295  # 0xFFFFFFFF


def _enc_long(c: Column) -> Column:
    hi = F.lpad(F.hex(F.shiftright(c.cast("long"), 32) + F.lit(_BIAS32)), 8, "0")
    lo = F.lpad(F.hex(c.cast("long").bitwiseAND(F.lit(_LOW32))), 8, "0")
    return F.concat(hi, lo)


def _enc_str(c: Column) -> Column:
    return F.concat(
        F.regexp_replace(c, "\x00", "\x00\xff"), F.lit("\x00")
    )


def encode_common_handle(*fields: tuple[Column, str]) -> Column:
    """Encode (column, kind) pairs — kind in {'long', 'string'} — into one
    order-preserving string handle. NULL in any field yields a NULL handle
    (a clustered PK is NOT NULL by definition; reject upstream)."""
    parts = []
    for col, kind in fields:
        if kind == "long":
            parts.append(_enc_long(col))
        elif kind == "string":
            parts.append(_enc_str(col))
        else:
            raise ValueError(f"unsupported common-handle field kind {kind!r}")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def encode_common_handle_py(*vals) -> str:
    """Driver-side mirror of encode_common_handle for point-read keys and
    oracle fixtures — same bytes, same ordering."""
    parts = []
    for v in vals:
        if isinstance(v, bool):
            raise ValueError("bool is not a handle field")
        if isinstance(v, int):
            if not (-(2**63) <= v < 2**63):
                raise ValueError(f"int64 out of range: {v}")
            hi = ((v >> 32) + _BIAS32) & 0xFFFFFFFF
            lo = v & _LOW32
            parts.append(f"{hi:08X}{lo:08X}")
        elif isinstance(v, str):
            parts.append(v.replace("\x00", "\x00\xff") + "\x00")
        else:
            raise ValueError(f"unsupported common-handle value {type(v)}")
    return "".join(parts)

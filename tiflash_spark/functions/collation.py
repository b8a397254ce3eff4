"""Collation-aware comparison helpers (SURVEY.md §1.4).

The reference threads ITiDBCollator through joins, aggregation and string
functions (dbms/src/TiDB/Collation/Collator.h:28-60: BINARY, ASCII_BIN,
LATIN1_BIN, UTF8MB4_BIN, UTF8MB4_GENERAL_CI, UTF8MB4_UNICODE_CI,
UTF8MB4_0900_*). Spark-first mapping:

- *_BIN collations        → Spark's default binary string semantics.
- UTF8MB4_GENERAL_CI-ish  → compare/group/join on a normalization key:
  lower() for the ASCII/Latin bulk; Spark 4's `collate()` expression
  (UTF8_LCASE / ICU locales) where available for full Unicode case
  folding. MySQL GENERAL_CI also ignores trailing spaces — PadSpace — so
  the key rtrims first.

Like the reference's explicit collator plumbing, collation here is an
explicit argument to the helpers, never ambient state.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@lru_cache(maxsize=None)
def _general_ci_weight(cp: int) -> int:
    """MySQL GENERAL_CI per-character sort weight, derived from PUBLIC
    Unicode data (unicodedata's UnicodeData.txt tables) instead of
    vendoring the reference's LUT (CollationLUT.cpp GeneralCI
    weight_lut). The derivation that reproduces the table:

    - weight = simple uppercase of the FIRST codepoint of the canonical
      (NFD) decomposition — é→e→E (0x45), İ→I+dot→I (0x49), ё→е→Е;
    - a character whose uppercase EXPANDS (ligatures: ﬃ→FFI) keeps its
      own codepoint — the old tables predate multi-char weights;
    - characters with no canonical decomposition keep their (simple-
      uppercased) selves — ẞ, fullwidth Ａ stay distinct from ß / A;
    - supplementary-plane characters all weigh 0xFFFD (utf8mb4_general_ci
      collapses the astral planes onto REPLACEMENT CHARACTER);
    - ß→'S' is the one non-derivable special case (the MySQL 4.x table
      predates ẞ and hand-mapped ß to S).
    """
    if cp >= 0x10000:
        return 0xFFFD
    if cp == 0xDF:  # ß
        return 0x53
    ch = chr(cp)
    d = unicodedata.normalize("NFD", ch)
    base = d[0]
    u = base.upper()
    return ord(u) if len(u) == 1 else ord(base)


_GCI_UDF = None


def _general_ci_key_udf():
    """Arrow-batched weight-string key; built lazily (pandas_udf needs an
    active SparkSession) and cached for the process."""
    global _GCI_UDF
    if _GCI_UDF is None:
        @F.pandas_udf("string")
        def _k(s: pd.Series) -> pd.Series:
            def one(x):
                if x is None:
                    return None
                return "".join(
                    chr(_general_ci_weight(ord(c))) for c in x
                )

            return pd.Series([one(x) for x in s], dtype=object)

        _GCI_UDF = _k
    return _GCI_UDF

BINARY = "binary"
BIN = "utf8mb4_bin"
GENERAL_CI = "utf8mb4_general_ci"
UNICODE_CI = "utf8mb4_unicode_ci"

# Named collations of the reference's Collator.h:28-60 enum, mapped onto
# the four key functions above. The pad/weight differences that matter:
#   ascii_bin / latin1_bin — single-byte charsets, PadSpace binary
#     (reference BinCollator<char, padding=true>) → same key as
#     utf8mb4_bin (rtrim).
#   utf8mb4_0900_bin      — the ONLY NoPad binary collation: raw bytes,
#     trailing spaces significant → same key as 'binary'.
#   utf8mb4_0900_ai_ci    — NoPad accent/case-insensitive (UCA-9.0.0):
#     ICU fold WITHOUT the rtrim that PadSpace collations apply.
ASCII_BIN = "ascii_bin"
LATIN1_BIN = "latin1_bin"
BIN_0900 = "utf8mb4_0900_bin"
AI_CI_0900 = "utf8mb4_0900_ai_ci"

_ALIASES = {ASCII_BIN: BIN, LATIN1_BIN: BIN, BIN_0900: BINARY}
_SUPPORTED = (BINARY, BIN, GENERAL_CI, UNICODE_CI,
              ASCII_BIN, LATIN1_BIN, BIN_0900, AI_CI_0900)


def collation_key(col: Column | str, collation: str = BIN, strict: bool = True) -> Column:
    """The comparison key a collation induces. PadSpace: MySQL's
    UTF8MB4_BIN is a *padding* binary collator — the reference
    instantiates it as BinCollator<Rune, padding=true> and rtrims both
    sides before comparing (Collator.h:415, CollatorCompare.h:70-89) — so
    trailing-space-only differences compare equal. Only the 'binary'
    collation (and 0900_bin) is NoPad raw-byte comparison.

    GENERAL_CI fidelity knob: the DEFAULT (strict=True, round 10) is the
    per-character weight key DERIVED from public Unicode data
    (_general_ci_weight above) — it matches the reference's LUT
    (CollationLUT.cpp GeneralCI::weight_lut) on every divergence-matrix
    row, including the rows the round-9 ICU key could not (ß=s, ß≠ẞ,
    ﬃ≠ffi, Ａ≠A). It is an Arrow-batched UDF, so the SQL surface's
    native *_ci collated columns keep the engine-native
    UNICODE_CI_AI_RTRIM collation instead (codegen-friendly; its
    residual rare-codepoint divergences stay pinned in
    tests/test_collation.py). ``strict=False`` keeps the
    lower(rtrim(...)) representative — exact on the ASCII bulk, accents
    distinct. All three keys' per-case behavior is pinned executable in
    test_general_ci_divergence_matrix."""
    c = F.col(col) if isinstance(col, str) else col
    collation = _ALIASES.get(collation, collation)
    if collation == BINARY:
        return c
    if collation == AI_CI_0900:
        # NoPad: no rtrim — 'a' and 'a ' are DISTINCT under 0900_ai_ci,
        # unlike unicode_ci (PadSpace); accents/case fold identically
        return F.collate(c, "UNICODE_CI_AI")
    if collation == BIN:
        return F.rtrim(c)
    if collation == GENERAL_CI:
        if strict:
            return _general_ci_key_udf()(F.rtrim(c))
        return F.lower(F.rtrim(c))
    if collation == UNICODE_CI:
        # UCA primary-weight comparison (Collator.h UTF8MB4_UNICODE_CI →
        # UCACICollator): case- AND accent-insensitive, PadSpace. Spark 4's
        # ICU UNICODE_CI_AI collation is the engine-native equivalent.
        # Known divergence: MySQL UCA-4.0 weights ß=s, ICU full UCA ß=ss.
        return F.collate(F.rtrim(c), "UNICODE_CI_AI")
    raise ValueError(f"unsupported collation {collation!r}; have {_SUPPORTED}")


def collated_eq(a: Column, b: Column, collation: str = BIN) -> Column:
    return collation_key(a, collation) == collation_key(b, collation)


def collated_group(df: DataFrame, col: str, collation: str = BIN) -> DataFrame:
    """groupBy under a collation: groups by the collation key, keeps the
    min binary value as the representative (deterministic, like the
    reference's first-seen arbitration but order-independent)."""
    key = collation_key(col, collation).alias("_ckey")
    return (
        df.withColumn("_ckey", key)
        .groupBy("_ckey")
        .agg(F.min(col).alias(col), F.count(F.lit(1)).alias("n"))
        .drop("_ckey")
    )


def collated_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    collation: str = BIN,
    how: str = "inner",
) -> DataFrame:
    """Equi-join under a collation — joins on the collation keys, exactly
    the collator-aware hash-join keys of the reference
    (dbms/src/Interpreters/Join.h:176)."""
    lk = collation_key(left_col, collation).alias("_lk")
    rk = collation_key(right_col, collation).alias("_rk")
    return (
        left.withColumn("_lk", lk)
        .join(right.withColumn("_rk", rk), F.col("_lk") == F.col("_rk"), how)
        .drop("_lk", "_rk")
    )

"""Text analysis operators over the documents table.

Token counting, type-token quality scoring, stopword ratios, language-ID
heuristic, and document fingerprinting — all as JVM-side higher-order
array expressions (F.split / F.transform / F.filter / F.array_distinct),
zero Python UDFs, so they run inside whole-stage codegen and scale
linearly with executors. Fingerprint = md5 of the normalized text: the
standard first pass of a web-scale dedup pipeline (exact-dup removal
before the MinHash stage, see pipeline/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table

STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.trim(text), " +")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS)))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, ~2]: type-token ratio (lexical
    diversity) + bounded length credit − stopword saturation. Mirrors the
    shape of C4/Gopher-style quality filters with engine-friendly math."""
    n = token_count(text)
    ttr = unique_token_count(text) / n
    stop_ratio = stopword_count(text) / n
    length_credit = F.least(n / F.lit(200.0), F.lit(1.0))
    return F.when(n > 0, ttr + length_credit - stop_ratio)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over lowercase,
    whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), " +", " "))


def lang_id_heuristic(text: Column) -> Column:
    """N-gram/stopword language heuristic: English function words vs none
    (the synthetic corpus shares one vocabulary, so the heuristic output is
    deterministic rather than accurate — the operator shape is the point)."""
    sr = stopword_count(text) / token_count(text)
    return (
        F.when(sr >= 0.08, F.lit("en_high"))
        .when(sr >= 0.03, F.lit("en_low"))
        .otherwise(F.lit("und"))
    )


def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token stats, quality, fingerprint; the whole-corpus
    pass every training-data pipeline starts with."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        "lang",
        token_count(t).alias("n_tokens"),
        unique_token_count(t).alias("n_unique"),
        stopword_count(t).alias("n_stop"),
        F.round(quality_score(t), 6).alias("quality"),
        fingerprint(t).alias("fp"),
        F.length(t).alias("n_chars_actual"),
        (F.length(t) == F.col("n_chars")).alias("len_consistent"),
    )


TEXT_ANALYSIS_SQL = """
WITH tok AS (
  SELECT doc_id, lang, n_chars, text,
         REGEXP_SPLIT_TO_ARRAY(TRIM(text), ' +') AS words
  FROM documents
)
SELECT
  doc_id,
  lang,
  CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE LEN(words) END AS n_tokens,
  LEN(LIST_DISTINCT(words)) AS n_unique,
  LEN(LIST_FILTER(words, t -> t IN ('the','a','of','and','to'))) AS n_stop,
  ROUND(
    CAST(LEN(LIST_DISTINCT(words)) AS DOUBLE) / LEN(words)
    + LEAST(LEN(words) / 200.0, 1.0)
    - CAST(LEN(LIST_FILTER(words, t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
      / LEN(words),
    6) AS quality,
  MD5(REGEXP_REPLACE(LOWER(TRIM(text)), ' +', ' ', 'g')) AS fp,
  LENGTH(text) AS n_chars_actual,
  LENGTH(text) = n_chars AS len_consistent
FROM tok
"""


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic rolled up against the labeled lang column."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id_heuristic(F.col("text")).alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


LANG_DISTRIBUTION_SQL = """
WITH scored AS (
  SELECT lang,
         CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), ' +'),
                              t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
         / LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), ' +')) AS sr
  FROM documents
)
SELECT lang,
       CASE WHEN sr >= 0.08 THEN 'en_high'
            WHEN sr >= 0.03 THEN 'en_low'
            ELSE 'und' END AS pred,
       COUNT(*) AS n
FROM scored
GROUP BY 1, 2
ORDER BY lang, pred
"""


QUERIES = {
    "text_analysis": text_analysis,
    "lang_distribution": lang_distribution,
}

ORACLE = {
    "text_analysis": TEXT_ANALYSIS_SQL,
    "lang_distribution": LANG_DISTRIBUTION_SQL,
}

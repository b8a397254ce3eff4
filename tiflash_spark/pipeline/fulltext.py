"""Full-text / inverted-index search analogue (SURVEY.md §1.5 indexes).

Reference: TiFlash ships full-text and inverted indexes as first-class
storage-layer indexes (dbms/src/Storages/DeltaMerge/Index/FullTextIndex/,
Index/InvertedIndex/; schema dbms/src/TiDB/Schema/FullTextIndex.h,
InvertedIndex.h) — a query intersects per-term posting lists instead of
scanning the corpus.

Spark-first analogue:
- build_postings(docs)  — tokenize → posexplode → (term, doc_id, tf,
  positions).  At rest this table is *bucketed by term* (see
  save_postings_bucketed), so a term lookup prunes to one bucket and a
  term↔term intersection is a co-located join with zero shuffle — the
  DataFrame rendering of a posting-list index.
- keyword_search        — posting-row filter on the query terms →
  per-doc agg (match count, tf sum) → HAVING all/any → top-k.  The
  corpus table itself is never scanned; only postings.
- phrase_search         — positional intersection: adjacent terms must
  appear at consecutive positions (positions array carried per posting,
  exactly the InvertedIndex posting payload).

Scale: postings are O(total tokens); the search plan touches only the
requested terms' rows — with term-bucketing that's a file-pruned scan,
then one shuffle on doc_id for the per-doc aggregation. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflash_spark.catalog import load_table

TOKEN_RE = "[^a-z0-9]+"


def tokenize(col) -> "F.Column":
    """Lowercase split on non-alphanumeric runs, empty tokens dropped."""
    return F.filter(F.split(F.lower(col), TOKEN_RE), lambda t: t != "")


def build_postings(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, doc_id, tf, positions) posting rows from a document table."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def save_postings_bucketed(
    postings: DataFrame, table: str, buckets: int = 64
) -> None:
    """Persist the index bucketed by term: lookups prune to one bucket,
    term-term joins co-locate (no shuffle) — the storage analogue of the
    reference's per-pack inverted index files."""
    (
        postings.write.mode("overwrite")
        .bucketBy(buckets, "term")
        .sortBy("term")
        .saveAsTable(table)
    )


def keyword_search(
    postings: DataFrame,
    terms: list[str],
    mode: str = "all",
    k: int = 10,
) -> DataFrame:
    """Top-k docs for a bag of terms: 'all' = every term must occur
    (posting-list intersection), 'any' = union. Ranked by total tf.
    Deterministic tiebreak on doc_id."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    hits = postings.filter(F.col("term").isin(*terms))
    per_doc = hits.groupBy("doc_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    if mode == "all":
        per_doc = per_doc.filter(F.col("n_terms") == len(set(terms)))
    return per_doc.orderBy(F.col("total_tf").desc(), F.col("doc_id")).limit(k)


def phrase_search(postings: DataFrame, phrase: list[str], k: int | None = 10) -> DataFrame:
    """Docs containing the exact phrase: intersect per-term posting rows on
    doc_id, requiring term i+1 at position p+1 for some p of term i. The
    phrase-occurrence count is the number of valid start positions."""
    if len(phrase) < 2:
        raise ValueError("phrase_search needs >= 2 terms")
    cur = (
        postings.filter(F.col("term") == phrase[0])
        .select("doc_id", F.col("positions").alias("starts"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == term).select(
            "doc_id", F.col("positions").alias("_next")
        )
        offset = i
        cur = (
            cur.join(nxt, "doc_id")
            .withColumn(
                "starts",
                F.filter(
                    F.col("starts"),
                    lambda p: F.array_contains(F.col("_next"), p + offset),
                ),
            )
            .filter(F.size("starts") > 0)
            .drop("_next")
        )
    out = cur.select(
        "doc_id", F.size("starts").cast("long").alias("n_occurrences")
    ).orderBy(F.col("n_occurrences").desc(), F.col("doc_id"))
    return out.limit(k) if k is not None else out


# --- driver queries ---------------------------------------------------------

SEARCH_TERMS = ["spark", "window", "hash"]
PHRASE = ["table", "scan"]


def fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword AND-search over documents via posting lists + a phrase count
    column for the fixed 2-gram, exercising both index paths."""
    docs = load_table(spark, sf_dir, "documents")
    postings = build_postings(docs).persist()
    kw = keyword_search(postings, SEARCH_TERMS, mode="all", k=20)
    ph = phrase_search(postings, PHRASE, k=None).withColumnRenamed(
        "n_occurrences", "phrase_hits"
    )
    out = (
        kw.join(ph, "doc_id", "left")
        .withColumn("phrase_hits", F.coalesce("phrase_hits", F.lit(0)))
        .orderBy(F.col("total_tf").desc(), F.col("doc_id"))
    )
    return out.select("doc_id", "n_terms", "total_tf", "phrase_hits")


FULLTEXT_SEARCH_SQL = """
WITH lst AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, toks[i] AS term, i - 1 AS pos
  FROM lst, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(toks))) AS i) g
),
postings AS (
  SELECT term, doc_id, COUNT(*) AS tf, LIST(pos ORDER BY pos) AS positions
  FROM tok GROUP BY term, doc_id
),
kw AS (
  SELECT doc_id, COUNT(DISTINCT term) AS n_terms, CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM postings
  WHERE term IN ('spark', 'window', 'hash')
  GROUP BY doc_id
  HAVING COUNT(DISTINCT term) = 3
  ORDER BY total_tf DESC, doc_id
  LIMIT 20
),
ph AS (
  SELECT a.doc_id,
         CAST(LEN(LIST_FILTER(a.positions, p -> LIST_CONTAINS(b.positions, p + 1)))
              AS BIGINT) AS phrase_hits
  FROM postings a JOIN postings b ON a.doc_id = b.doc_id
  WHERE a.term = 'table' AND b.term = 'scan'
)
SELECT kw.doc_id, kw.n_terms, kw.total_tf,
       CAST(COALESCE(ph.phrase_hits, 0) AS BIGINT) AS phrase_hits
FROM kw LEFT JOIN ph ON kw.doc_id = ph.doc_id
ORDER BY kw.total_tf DESC, kw.doc_id
"""

QUERIES = {"fulltext_search": fulltext_search}
ORACLE = {"fulltext_search": FULLTEXT_SEARCH_SQL}

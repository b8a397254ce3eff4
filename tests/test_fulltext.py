"""Inverted-index/full-text analogue tests (reference
dbms/src/Storages/DeltaMerge/Index/InvertedIndex/, FullTextIndex/):
posting-list construction, keyword AND/OR search, positional phrase
search, and the bucketed-index no-shuffle property."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tiflash_spark.pipeline.fulltext import (
    build_postings,
    keyword_search,
    phrase_search,
)

DOCS = [
    Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
    Row(doc_id=2, text="quick quick fox"),
    Row(doc_id=3, text="lazy dog sleeps; the dog barks"),
    Row(doc_id=4, text="Fox? QUICK-fox! brown."),
    Row(doc_id=5, text="nothing relevant here"),
]


@pytest.fixture(scope="module")
def postings(spark):
    return build_postings(spark.createDataFrame(DOCS)).persist()


def test_posting_rows(postings):
    row = postings.filter((F.col("term") == "quick") & (F.col("doc_id") == 2)).collect()[0]
    assert row.tf == 2
    assert row.positions == [0, 1]
    # tokenization: punctuation/case folded (doc 4 has fox twice)
    row4 = postings.filter((F.col("term") == "fox") & (F.col("doc_id") == 4)).collect()[0]
    assert row4.tf == 2


def test_keyword_all_vs_any(postings):
    all_hits = {r.doc_id for r in keyword_search(postings, ["quick", "fox"], "all").collect()}
    assert all_hits == {1, 2, 4}
    any_hits = {r.doc_id for r in keyword_search(postings, ["quick", "dog"], "any").collect()}
    assert any_hits == {1, 2, 3, 4}
    with pytest.raises(ValueError):
        keyword_search(postings, ["x"], mode="phrase")


def test_phrase_search_positional(postings):
    # "quick fox" consecutive: doc 2 (pos 1→2) and doc 4 (QUICK-fox) only;
    # doc 1 has both words, never adjacent
    hits = {r.doc_id: r.n_occurrences for r in phrase_search(postings, ["quick", "fox"]).collect()}
    assert hits == {2: 1, 4: 1}
    # three-term phrase: only doc 1 has the full consecutive run
    three = {r.doc_id for r in phrase_search(postings, ["quick", "brown", "fox"]).collect()}
    assert three == {1}
    lazy = {r.doc_id for r in phrase_search(postings, ["lazy", "dog"]).collect()}
    assert lazy == {1, 3}


def test_bucketed_postings_join_no_shuffle(spark, postings, tmp_path):
    """Term-bucketed posting lists co-locate a term↔term intersection:
    at most the final agg exchanges (the index bucket join itself must
    not shuffle) — the analogue of per-pack index locality."""
    from tiflash_spark.pipeline.fulltext import save_postings_bucketed
    from tiflash_spark.plans.explain import exchange_count

    save_postings_bucketed(postings.drop("positions"), "ft_idx_test", buckets=4)
    idx = spark.table("ft_idx_test")
    a = idx.filter(F.col("term") == "quick")
    b = idx.filter(F.col("term") == "fox")
    joined = a.join(b, "doc_id")  # doc-join still shuffles on doc_id
    term_join = a.alias("x").join(b.alias("y"), F.col("x.term") == F.col("y.term"))
    assert exchange_count(term_join) == 0
    assert joined.count() >= 1
    spark.sql("DROP TABLE IF EXISTS ft_idx_test")

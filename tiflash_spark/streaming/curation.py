"""Streaming curation: the batch curation chain (quality gate → dedup →
decontaminate → token accounting) as a CONTINUOUS ingestion pipeline.

A production training-data pipeline is not a one-shot batch job — new
crawl/document batches arrive continuously, and the curation decisions
(quality, dedup, decontamination) must be made at append time so the
curated corpus is always serving-ready (the reference's analogue is the
always-on Raft ingest path feeding DeltaTree, SURVEY.md §2.6; this module
is its curation-aware counterpart).

Composition rules (what makes each stage streaming-legal):
- quality gate: pure codegen column expressions (pipeline/text.py's
  Gopher-shape signals) — stateless, any output mode.
- dedup: state-store-backed dropDuplicatesWithinWatermark on the content
  fingerprint — state bounded by the watermark delay (O(keys-per-window),
  evicted as the watermark passes), NOT O(corpus). Cross-window dups are
  the historical-dedup problem: handled at rest by dedup_incremental's
  (fp, doc_id) anti join, exactly the batch/stream split real pipelines
  use (stream folds the burst, batch folds history).
- decontamination: the eval set is benchmark-sized by definition, so the
  gram set rides as a broadcast-able LITERAL array and the check is a
  stateless arrays_overlap — the same broadcast tier batch
  decontaminate() uses below BROADCAST_GRAM_LIMIT. A too-large eval set
  raises rather than silently degrading (the shuffle tier is not
  streaming-expressible without an aggregation mode change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflash_spark.pipeline.curation import BROADCAST_GRAM_LIMIT, NGRAM_N
from tiflash_spark.pipeline.text import (
    mean_word_len,
    tokens,
    top_word_frac,
)

__all__ = ["quality_gate", "decontaminate_stream", "curate_stream"]


def quality_gate(text: Column) -> Column:
    """The conjunctive keep rule of pipeline/text.quality_signals (length
    window ∧ mean-word-length window ∧ top-word-frac cap) as one reusable
    boolean column — stateless, safe in any streaming output mode."""
    w = tokens(text)
    n = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(w))
    mwl = mean_word_len(w)
    return (
        (n >= 10)
        & (n <= 100_000)
        & (mwl >= 3)
        & (mwl <= 10)
        & (top_word_frac(w) <= 0.2)
    )


def _eval_grams(eval_docs: DataFrame, text_col: str) -> list[str]:
    """Collect the eval set's word n-grams to a bounded driver-side list
    (benchmark-sized by contract — enforced against BROADCAST_GRAM_LIMIT,
    the same bound batch decontaminate() switches tiers on)."""
    from tiflash_spark.pipeline.curation import word_ngrams

    grams = [
        r.g
        for r in eval_docs.select(
            F.explode(word_ngrams(F.col(text_col), NGRAM_N)).alias("g")
        )
        .distinct()
        .collect()
    ]
    if len(grams) > BROADCAST_GRAM_LIMIT:
        raise ValueError(
            f"eval gram set ({len(grams)}) exceeds the broadcast bound "
            f"({BROADCAST_GRAM_LIMIT}); streaming decontamination requires "
            "a benchmark-sized eval set — decontaminate the backlog in "
            "batch (pipeline/curation.decontaminate) instead"
        )
    return sorted(grams)


def decontaminate_stream(
    stream: DataFrame, eval_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop stream docs sharing any word NGRAM_N-gram with the eval set.
    The gram set is resolved ONCE at plan time into a literal array, so
    the per-row check (arrays_overlap) is stateless codegen."""
    from tiflash_spark.pipeline.curation import word_ngrams

    grams = _eval_grams(eval_docs, text_col)
    if not grams:
        return stream
    return stream.filter(
        ~F.arrays_overlap(
            word_ngrams(F.col(text_col), NGRAM_N),
            F.lit(grams).cast("array<string>"),
        )
    )


def curate_stream(
    stream: DataFrame,
    eval_docs: DataFrame | None = None,
    history_fps: DataFrame | None = None,
    ts_col: str = "ts",
    text_col: str = "text",
    delay: str = "10 minutes",
) -> DataFrame:
    """quality gate → history dedup → watermark-bounded fingerprint
    dedup → decontaminate → token accounting, over a streaming documents
    source.

    Returns the curated append stream with `fp` (content fingerprint,
    the key dedup_incremental uses against the at-rest corpus) and
    `n_tok` added. Stage order matters for state size: the quality gate,
    history check and decontamination run BEFORE the stateful dedup so
    junk, already-ingested content and eval overlap never enter the
    state store.

    ``history_fps``: a static DataFrame with an `fp` column (the at-rest
    corpus's fingerprints — e.g. the table dedup_incremental maintains).
    Stream-static LEFT ANTI drops docs whose content is already in the
    corpus; Spark re-plans the static side per micro-batch, so a history
    refresh is picked up without restarting the query — the
    dedup_incremental batch/stream split closed into one pipeline."""
    from tiflash_spark.streaming.dedup import streaming_dedup

    gated = stream.filter(quality_gate(F.col(text_col)))
    if eval_docs is not None:
        gated = decontaminate_stream(gated, eval_docs, text_col)
    fp = F.md5(F.trim(F.col(text_col)))
    gated = gated.withColumn("fp", fp)
    if history_fps is not None:
        # no broadcast hint: history is corpus-sized at scale — let AQE
        # pick (it broadcasts the MICRO-BATCH side when that is smaller);
        # at 100 TB the static side should be the bucketed fp table
        # dedup_incremental maintains, so the anti join co-locates on fp
        # instead of re-shuffling history per micro-batch
        gated = gated.join(history_fps.select("fp").distinct(), "fp", "left_anti")
    deduped = streaming_dedup(gated, ["fp"], ts_col, delay=delay)
    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(tokens(F.col(text_col))))
    return deduped.withColumn("n_tok", n_tok.cast("long"))

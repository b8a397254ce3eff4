"""Streaming curation pipeline e2e: quality gate -> watermark dedup ->
decontamination -> token accounting over file-source micro-batches, with
state persisting across restarts (SURVEY.md §2.6 ingest path, curation-
aware variant)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflash_spark.streaming.curation import (
    curate_stream,
    decontaminate_stream,
    quality_gate,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

CLEAN_A = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
CLEAN_E = "noble quartz vivid zephyr magnet copper lunar tidal ember frost glade haven"
JUNK_B = "spam spam spam spam spam spam spam spam spam spam spam spam"
EVAL_TXT = "secret bench eval gram five tail words here now"
CONTAM_D = "prefix words then secret bench eval gram five and a clean tail suffix"


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_quality_gate_literal(spark):
    df = spark.createDataFrame(
        [(CLEAN_A,), (JUNK_B,), ("tiny",), ("",)], "text: string"
    ).select(quality_gate(F.col("text")).alias("keep"))
    assert [r.keep for r in df.collect()] == [True, False, False, False]


def test_decontaminate_stream_is_stateless_codegen(spark, tmp_path):
    """The gram check must be a literal-array filter (no join, no state) —
    plan contains arrays_overlap and no streaming aggregation."""
    src = str(tmp_path / "in")
    _write(f"{src}/b0.json", [{"ts": "2024-01-01 00:01:00", "doc_id": 1, "text": CONTAM_D}])
    eval_docs = spark.createDataFrame([(EVAL_TXT,)], "text: string")
    out = decontaminate_stream(
        spark.readStream.schema(SCHEMA).json(src), eval_docs
    )
    assert "arrays_overlap" in out._jdf.queryExecution().analyzed().toString()


def test_curate_stream_e2e_and_state_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    eval_docs = spark.createDataFrame([(EVAL_TXT,)], "text: string")
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "text": CLEAN_A},
            {"ts": "2024-01-01 00:01:10", "doc_id": 2, "text": JUNK_B},
            {"ts": "2024-01-01 00:01:20", "doc_id": 3, "text": CLEAN_A},  # fp dup of 1
            {"ts": "2024-01-01 00:01:30", "doc_id": 4, "text": CONTAM_D},
        ],
    )
    curated = curate_stream(
        spark.readStream.schema(SCHEMA).json(src), eval_docs=eval_docs
    )
    _run(curated, out, ckpt)

    # second batch through a NEW query instance on the same checkpoint:
    # the fp state must survive, folding a cross-batch re-delivery
    _write(
        f"{src}/b1.json",
        [
            {"ts": "2024-01-01 00:03:00", "doc_id": 5, "text": CLEAN_A},  # redelivery
            {"ts": "2024-01-01 00:04:00", "doc_id": 6, "text": CLEAN_E},
        ],
    )
    curated2 = curate_stream(
        spark.readStream.schema(SCHEMA).json(src), eval_docs=eval_docs
    )
    _run(curated2, out, ckpt)

    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [1, 6]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].n_tok == 12 and by_id[6].n_tok == 12
    assert by_id[1].fp is not None and by_id[1].fp != by_id[6].fp


def test_curate_stream_history_anti_join(spark, tmp_path):
    """Docs whose fingerprint is already in the at-rest corpus never
    reach the sink (stream-static LEFT ANTI on fp — dedup_incremental's
    batch/stream split closed into one pipeline)."""
    from pyspark.sql import functions as F2

    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "text": CLEAN_A},
            {"ts": "2024-01-01 00:02:00", "doc_id": 2, "text": CLEAN_E},
        ],
    )
    history = spark.createDataFrame([(CLEAN_A,)], "text: string").select(
        F2.md5(F2.trim("text")).alias("fp")
    )
    curated = curate_stream(
        spark.readStream.schema(SCHEMA).json(src), history_fps=history
    )
    _run(curated, out, ckpt)
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]


def test_curated_stream_feeds_delta_store(spark, tmp_path):
    """Full continuous pipeline: file source -> curate_stream ->
    start_ingest -> DeltaStore. Only curated docs land in the store;
    resume on the same checkpoint ingests only the new batch; MVCC
    versions stay monotonic (earlier snapshot excludes the later batch)."""
    from pyspark.sql import functions as F2

    from tiflash_spark.operators.mvcc import HANDLE
    from tiflash_spark.sources.delta_store import DeltaStore
    from tiflash_spark.streaming.ingest import start_ingest

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    store = DeltaStore(spark, str(tmp_path / "store"))
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "text": CLEAN_A},
            {"ts": "2024-01-01 00:01:10", "doc_id": 2, "text": JUNK_B},
            {"ts": "2024-01-01 00:01:20", "doc_id": 3, "text": CLEAN_A},
        ],
    )

    def run():
        curated = curate_stream(spark.readStream.schema(SCHEMA).json(src))
        rows = curated.select(
            F2.col("doc_id").alias(HANDLE), "text", "fp", "n_tok"
        )
        start_ingest(rows, store, ckpt).awaitTermination(120)

    run()
    assert {r[HANDLE] for r in store.read().collect()} == {1}
    v_after_b0 = 2  # batch 0 -> version 2 (see start_ingest versioning)

    _write(
        f"{src}/b1.json",
        [
            {"ts": "2024-01-01 00:02:00", "doc_id": 4, "text": CLEAN_A},  # redelivery
            {"ts": "2024-01-01 00:02:10", "doc_id": 5, "text": CLEAN_E},
        ],
    )
    run()
    assert {r[HANDLE] for r in store.read().collect()} == {1, 5}
    # stale snapshot at the batch-0 version excludes the later ingest
    assert {r[HANDLE] for r in store.read(ts=v_after_b0).collect()} == {1}


def test_streamed_store_serves_fulltext_search(spark, tmp_path):
    """End-to-end: curated stream -> store -> maintain (compact + index
    refresh) -> full-text search. The index serves the folded history;
    a post-maintain streamed batch is still searchable exactly through
    the delta tail before any refresh."""
    from pyspark.sql import functions as F2

    from tiflash_spark.operators.mvcc import HANDLE
    from tiflash_spark.sources.delta_store import DeltaStore
    from tiflash_spark.streaming.ingest import start_ingest

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    store = DeltaStore(spark, str(tmp_path / "store"))
    _write(
        f"{src}/b0.json",
        [
            {"ts": "2024-01-01 00:01:00", "doc_id": 1, "text": CLEAN_A},
            {"ts": "2024-01-01 00:01:10", "doc_id": 2, "text": JUNK_B},
            {"ts": "2024-01-01 00:01:20", "doc_id": 7, "text": CLEAN_E},
        ],
    )

    def run():
        curated = curate_stream(spark.readStream.schema(SCHEMA).json(src))
        rows = curated.select(F2.col("doc_id").alias(HANDLE), "text")
        start_ingest(rows, store, ckpt).awaitTermination(120)

    run()
    store.compact(ts=10, num_segments=2)
    store.build_fulltext_index("text")
    # 'alpha' is in CLEAN_A only; junk doc 2 never landed
    got = sorted(r[HANDLE] for r in store.fts_match_word("text", "alpha").collect())
    assert got == [1]
    # a new streamed batch is searchable through the unindexed delta tail
    _write(
        f"{src}/b1.json",
        [{"ts": "2024-01-01 00:02:00", "doc_id": 9,
          "text": CLEAN_A.replace("alpha", "alpha zulu")}],
    )
    run()
    got2 = sorted(r[HANDLE] for r in store.fts_match_word("text", "alpha").collect())
    assert got2 == [1, 9]
    assert [r[HANDLE] for r in store.fts_match_word("text", "zulu").collect()] == [9]
    # maintain folds the tail; the refreshed index now covers doc 9 too
    store.maintain(ts=20, delta_threshold=0)
    got3 = sorted(r[HANDLE] for r in store.fts_match_word("text", "alpha").collect())
    assert got3 == [1, 9]
    assert store.delta_rows() == 0

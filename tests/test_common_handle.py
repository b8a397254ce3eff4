"""Clustered-index (common handle) tests.

Reference: tables with a non-int clustered PK carry the memcomparable
encoded key as their handle (tests/fullstack-test2/clustered_index/,
KVStore/Decode common-handle paths). Here: the encoder's order
preservation, and the full DeltaStore lifecycle on string handles —
snapshot reads, hash/range segments, point/range reads, incremental
compaction, split/merge/rebalance.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.sources.common_handle import (
    encode_common_handle,
    encode_common_handle_py,
)
from tiflash_spark.sources.delta_store import DeltaStore


def test_encoder_order_preserving_and_engine_identical(spark):
    rng = random.Random(7)
    words = ["", "a", "ab", "b", "scan", "scan\x00x", "table", "zzz", "sc"]
    tuples = [
        (rng.choice(words), rng.randrange(-(2**62), 2**62))
        for _ in range(200)
    ] + [("a", -1), ("a", 0), ("a", 1), ("", 2**62), ("\x00", 0)]
    py_enc = [encode_common_handle_py(s, i) for s, i in tuples]
    # order preservation: encoded order == tuple order
    assert sorted(range(len(tuples)), key=lambda i: py_enc[i]) == sorted(
        range(len(tuples)), key=lambda i: tuples[i]
    )
    # Spark expression produces byte-identical encodings
    df = spark.createDataFrame(tuples, "s string, i long").select(
        encode_common_handle((F.col("s"), "string"), (F.col("i"), "long")).alias("h"),
        "s",
        "i",
    )
    for r in df.collect():
        assert r.h == encode_common_handle_py(r.s, r.i), (r.s, r.i)


def _ch_rows(spark, rows):
    """rows: (name, seq, payload) → frame keyed by encoded (name, seq)."""
    df = spark.createDataFrame(rows, "name string, seq long, payload long")
    return df.select(
        encode_common_handle((F.col("name"), "string"), (F.col("seq"), "long")).alias(
            HANDLE
        ),
        "payload",
    )


@pytest.fixture()
def ch_store(spark, tmp_path):
    store = DeltaStore(spark, str(tmp_path / "ch_store"))
    store.write_batch(
        _ch_rows(spark, [(w, s, i * 10) for i, (w, s) in enumerate(
            [(w, s) for w in ("ant", "bee", "cat", "dog") for s in (1, 2, 3)]
        )]),
        version=1,
    )
    return store


def _payloads(df):
    return {r[HANDLE]: r.payload for r in df.collect()}


def test_clustered_store_snapshot_and_point_reads(spark, ch_store):
    k_bee2 = encode_common_handle_py("bee", 2)
    k_cat1 = encode_common_handle_py("cat", 1)
    # update one key, delete another at v2
    ch_store.write_batch(_ch_rows(spark, [("bee", 2, 999)]), version=2)
    ch_store.write_batch(
        _ch_rows(spark, [("cat", 1, 0)]), version=2, delete=True
    )
    v1 = _payloads(ch_store.read(1))
    v2 = _payloads(ch_store.read(2))
    assert len(v1) == 12 and v1[k_bee2] == 40 and k_cat1 in v1
    assert len(v2) == 11 and v2[k_bee2] == 999 and k_cat1 not in v2
    # hash segments + point reads through the persisted modulus
    ch_store.compact(2, num_segments=4)
    pt = _payloads(ch_store.read_handles([k_bee2, k_cat1]))
    assert pt == {k_bee2: 999}


def test_clustered_store_range_segments_and_lifecycle(spark, ch_store):
    ch_store.compact_range_segments(1, num_segments=3)
    man = ch_store._manifest()
    assert man["n"] == 3 and man.get("handle") == "string"
    # bounds are contiguous half-open strings
    ordered = sorted(man["bounds"].values(), key=lambda b: b[0])
    for (_, lhi), (rlo, _) in zip(ordered, ordered[1:]):
        assert lhi == rlo
    # range read: every 'bee' and 'cat' key (lexicographic slice)
    lo = encode_common_handle_py("bee", -(2**62))
    hi = encode_common_handle_py("cat", 2**62)
    got = _payloads(ch_store.read_range(lo, hi))
    assert len(got) == 6
    assert all(
        k.startswith("bee\x00") or k.startswith("cat\x00") for k in got
    )
    # incremental compaction after new writes (incl. out-of-range key)
    ch_store.write_batch(_ch_rows(spark, [("zebra", 9, 777), ("ant", 1, 111)]), version=3)
    dirty, total = ch_store.compact_segments_incremental(3)
    assert 1 <= dirty <= total
    allrows = _payloads(ch_store.read())
    assert len(allrows) == 13
    assert allrows[encode_common_handle_py("zebra", 9)] == 777
    assert allrows[encode_common_handle_py("ant", 1)] == 111
    # split the largest segment, then rebalance small ones back together
    old_id, new_id = ch_store.split_segment()
    man2 = ch_store._manifest()
    assert man2["n"] == 4
    assert _payloads(ch_store.read()) == allrows
    splits, merges = ch_store.rebalance_segments(max_rows=100, min_rows=100)
    assert merges >= 1
    assert _payloads(ch_store.read()) == allrows


def test_clustered_store_schema_evolution(spark, ch_store):
    ch_store.add_column("extra", "string")
    ch_store.write_batch(
        _ch_rows(spark, [("eel", 1, 5)]).withColumn("extra", F.lit("new")),
        version=4,
    )
    rows = {r[HANDLE]: r for r in ch_store.read().collect()}
    k_new = encode_common_handle_py("eel", 1)
    assert rows[k_new].extra == "new"
    assert rows[encode_common_handle_py("ant", 1)].extra is None
    ch_store.compact_range_segments(4, num_segments=2)
    rows2 = {r[HANDLE]: r for r in ch_store.read().collect()}
    assert rows2[k_new].extra == "new" and len(rows2) == 13


def test_streaming_ingest_into_clustered_store(spark, tmp_path):
    """Raft-apply analogue into a clustered-index table: file-source stream
    of composite-PK rows upserts through foreachBatch; snapshot read sees
    the merged state keyed by the encoded handle."""
    src = tmp_path / "feed"
    src.mkdir()
    ck = str(tmp_path / "ck")
    store = DeltaStore(spark, str(tmp_path / "ch_stream"))

    from tiflash_spark.streaming.ingest import start_ingest

    b1 = spark.createDataFrame(
        [("ant", 1, 10, False), ("bee", 1, 20, False), ("bee", 2, 30, False)],
        "name string, seq long, payload long, is_del boolean",
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(
            "name string, seq long, payload long, is_del boolean"
        )
        .parquet(str(src))
        .select(
            encode_common_handle((F.col("name"), "string"), (F.col("seq"), "long"))
            .alias(HANDLE),
            "payload",
            "is_del",
        )
    )
    start_ingest(stream, store, ck, delete_col="is_del").awaitTermination(120)
    got = {r[HANDLE]: r.payload for r in store.read().collect()}
    assert got == {
        encode_common_handle_py("ant", 1): 10,
        encode_common_handle_py("bee", 1): 20,
        encode_common_handle_py("bee", 2): 30,
    }
    # batch 2: update + delete, then restart the stream from checkpoint
    b2 = spark.createDataFrame(
        [("bee", 2, 99, False), ("ant", 1, 0, True)],
        "name string, seq long, payload long, is_del boolean",
    )
    b2.coalesce(1).write.mode("append").parquet(str(src))
    start_ingest(stream, store, ck, delete_col="is_del").awaitTermination(120)
    got2 = {r[HANDLE]: r.payload for r in store.read().collect()}
    assert got2 == {
        encode_common_handle_py("bee", 1): 20,
        encode_common_handle_py("bee", 2): 99,
    }


def test_encoder_order_property(spark):
    """Property-based: for arbitrary (string, int64) tuples — including
    NULs, high codepoints, and int boundaries — encoded string order
    equals tuple order (Python side; Spark binary UTF-8 order matches
    code-point order, pinned by the engine-identical test above)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ints = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    texts = st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF), max_size=12
    )

    @settings(max_examples=300, deadline=None)
    @given(st.tuples(texts, ints), st.tuples(texts, ints))
    def check(a, b):
        ea, eb = encode_common_handle_py(*a), encode_common_handle_py(*b)
        assert (a < b) == (ea < eb) and (a == b) == (ea == eb)

    check()

"""Multimodal plumbing tests: mapInPandas decode schema/batching, empty
payloads, and the aggregate stats query."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMALL
from tiflash_spark.pipeline.multimodal import (
    DECODED_SCHEMA,
    FEATURE_DIM,
    FEATURES_SCHEMA,
    FRAMES_SCHEMA,
    RESIZED_SCHEMA,
    decode_media,
    extract_features,
    multimodal_decode,
    multimodal_stages,
    resize_media,
    sample_frames,
    synthetic_media,
)


def test_decode_schema_and_hist(spark):
    media = synthetic_media(spark, SF_SMALL)
    decoded = decode_media(media)
    assert decoded.schema == DECODED_SCHEMA
    rows = decoded.orderBy("media_id").limit(5).collect()
    for r in rows:
        assert r.ok
        assert sum(r.channel_hist) == min(r.n_bytes, 4096)
        assert r.width is not None


def test_decode_empty_payload_row(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, media_type="image/png", payload=b"", meta=Row(declared_w=0, declared_h=0, codec="fake"))],
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("media_type", T.StringType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("declared_w", T.IntegerType()),
                            T.StructField("declared_h", T.IntegerType()),
                            T.StructField("codec", T.StringType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    r = decode_media(df).collect()[0]
    assert not r.ok
    assert r.width is None and r.channel_hist is None


def test_multimodal_rollup_totals(spark):
    out = {r.media_type: r for r in multimodal_decode(spark, SF_SMALL).collect()}
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n for r in out.values()) == n_docs
    assert all(r.n_ok == r.n for r in out.values())


def test_resize_byte_budget(spark):
    media = synthetic_media(spark, SF_SMALL)
    resized = resize_media(media, target_w=224, target_h=224)
    assert resized.schema == RESIZED_SCHEMA
    joined = (
        resized.alias("r")
        .join(media.alias("m"), "media_id")
        .select(
            "media_id",
            F.octet_length("r.payload").alias("out_bytes"),
            F.octet_length("m.payload").alias("in_bytes"),
            F.col("m.meta.declared_w").alias("dw"),
            F.col("m.meta.declared_h").alias("dh"),
            "r.width",
            "r.height",
        )
        .collect()
    )
    assert len(joined) > 0
    for r in joined:
        assert (r.width, r.height) == (224, 224)
        # resize never grows the payload, and shrinks it proportionally
        assert r.out_bytes <= r.in_bytes
        if r.in_bytes > 0:
            assert r.out_bytes >= 1
            src_px = max(1, r.dw * r.dh)
            expect = max(1, int(r.in_bytes * min(1.0, 224 * 224 / src_px)))
            assert r.out_bytes == expect


def test_frame_sampling_fans_out(spark):
    media = synthetic_media(spark, SF_SMALL)
    # divisor 1 → one frame per 64 payload bytes, so sf0.001's short
    # documents still exercise the 1-row→N-rows fan-out path
    frames = sample_frames(media, fps_divisor=1, max_frames=8)
    assert frames.schema == FRAMES_SCHEMA
    per_media = (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_no").alias("max_frame"),
            F.min("ts_ms").alias("min_ts"),
        )
        .collect()
    )
    n_media = media.count()
    assert len(per_media) == n_media  # every input row yields >=1 frame
    assert all(1 <= r.n_frames <= 8 for r in per_media)
    assert all(r.max_frame == r.n_frames - 1 for r in per_media)
    assert all(r.min_ts == 0 for r in per_media)
    # fan-out actually happens: bigger payloads produce multiple frames
    assert any(r.n_frames > 1 for r in per_media)


def test_feature_vectors_unit_norm(spark):
    media = synthetic_media(spark, SF_SMALL)
    feats = extract_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        nrm = sum(x * x for x in r.feature)
        assert abs(nrm - 1.0) < 1e-5
        assert all(x > 0 for x in r.feature)  # +1 smoothing keeps bins positive


def test_multimodal_stages_rollup(spark):
    out = {r.media_type: r for r in multimodal_stages(spark, SF_SMALL).collect()}
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n_media for r in out.values()) == n_docs
    for r in out.values():
        assert r.n_frames >= r.n_media  # >=1 frame per media row
        assert r.frame_bytes <= r.resized_bytes
        assert 0.0 < r.avg_f1 < 1.0


def test_feature_extraction_feeds_ann(spark):
    """Multimodal features flow straight into the ANN machinery: the
    mapInPandas stage boundary must not break the broadcast topk plan,
    and the chain is deterministic end to end."""
    from pyspark.sql import functions as F

    from tiflash_spark.functions.vector import vec_cosine_similarity
    from tiflash_spark.pipeline.multimodal import extract_features, synthetic_media

    sf = "/root/testdata/sf0.001"
    media = synthetic_media(spark, sf)
    feats = extract_features(media)
    q = feats.filter(F.col("media_id") == 0).select(
        F.col("feature").alias("qf")
    )
    deq = F.transform(F.col("feature"), lambda x: x.cast("double"))
    dq = F.transform(F.col("qf"), lambda x: x.cast("double"))
    top = (
        feats.filter(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "media_id",
            F.round(vec_cosine_similarity(deq, dq), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("media_id"))
        .limit(5)
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    r1 = [(r.media_id, r.sim) for r in top.collect()]
    r2 = [(r.media_id, r.sim) for r in top.collect()]
    assert r1 == r2 and len(r1) == 5
    assert all(-1.0 <= s <= 1.0 for _, s in r1)


def test_multimodal_ann_chain_topk_and_plan(spark):
    """resize → extract_features → cosine topk as one plan: exact top-10,
    and the mapInPandas boundary must not introduce any shuffle — the only
    exchange is the 1-row query broadcast, the sink is TakeOrderedAndProject."""
    from tiflash_spark.pipeline.multimodal import multimodal_ann_chain
    from tiflash_spark.plans.explain import count_operator, exchange_count

    df = multimodal_ann_chain(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(r.media_id != 0 for r in rows)
    assert all(-1.0 <= s <= 1.0 for s in sims)
    assert exchange_count(df) == 0
    assert count_operator(df, "TakeOrderedAndProject") >= 1


def test_phash_stub_mean_threshold():
    """Integer mean-threshold construction: uniform bytes -> no bit set
    (nothing strictly above the mean); a single dominant bucket -> only
    that bit; empty payload -> 0."""
    from tiflash_spark.pipeline.multimodal import phash_stub

    assert phash_stub(b"") == 0
    assert phash_stub(None) == 0
    assert phash_stub(bytes(range(16)) * 4) == 0  # perfectly uniform
    assert phash_stub(bytes([3]) * 100) == 1 << 3  # one hot bucket


def test_phash_media_numpy_matches_stub(spark):
    """The NumPy bincount path inside phash_media (round-10 speedup)
    computes the same integer mean-threshold signature as the scalar
    phash_stub reference, including None/empty, the 4096-byte cap, and
    payloads with every bucket shape."""
    import random

    from pyspark.sql import Row

    from tiflash_spark.pipeline.multimodal import phash_media, phash_stub

    rng = random.Random(7)
    payloads = [
        None,
        b"",
        bytes(range(16)) * 4,
        bytes([3]) * 100,
        bytes(rng.randrange(256) for _ in range(5000)),  # beyond the 4096 cap
        bytes(rng.randrange(256) for _ in range(333)),
        bytes([255, 0, 17]) * 50,
    ]
    rows = [
        Row(media_id=i, media_type="image/png", payload=p,
            meta=Row(declared_w=0, declared_h=0, codec="fake"))
        for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows)
    got = {r.media_id: r.phash for r in phash_media(df).collect()}
    want = {i: phash_stub(p) for i, p in enumerate(payloads)}
    assert got == want


def test_multimodal_phash_report_consistency(spark):
    """Exact-dup members >= 2 per group; banded candidates are DISTINCT
    SIGNATURE pairs (exact dups are grouped before banding — banding raw
    rows is the quadratic blow-up the docstring forbids), bounded by
    C(n_sigs, 2)."""
    from tests.conftest import SF_SMALL
    from tiflash_spark.pipeline.multimodal import multimodal_phash_dedup

    r = multimodal_phash_dedup(spark, SF_SMALL).collect()[0]
    assert r.n_sigs <= r.n_media
    assert r.n_dup_media >= 2 * r.n_dup_groups
    assert 0 <= r.n_band_sig_pairs <= r.n_sigs * (r.n_sigs - 1) // 2

"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns + a typed metadata struct, with
decode / feature-extract / resize / frame-sample implemented as
Arrow-batched pandas iterators over ``mapInPandas`` — the only correct
shape for Python-side media work at 100 TB (batch transfer, no per-row
pickling, decode libraries loaded once per executor, not per row).

The actual byte decoding is STUBBED (no image/audio libs in this
container): `decode_image_stub` produces a deterministic fake decode
(dimensions + channel histogram derived from the bytes themselves), and
the real-library call site is marked. Everything Spark-side — schema,
batching, partition sizing, UDF signatures — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflash_spark.catalog import load_table

# Schema of a multimodal record: opaque payload + typed metadata, the
# pattern the reference uses for its opaque JSON/vector payloads.
MEDIA_SCHEMA = T.StructType(
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
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_hist", T.ArrayType(T.LongType())),
        T.StructField("ok", T.BooleanType()),
    ]
)


def decode_image_stub(payload: bytes, meta: dict[str, Any]) -> dict[str, Any]:
    """Deterministic fake decode.

    REAL IMPLEMENTATION SITE: replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — the surrounding mapInPandas
    plumbing (batching, schema, error row) is what this module tests.
    """
    if payload is None or len(payload) == 0:
        return {"width": None, "height": None, "channel_hist": None, "ok": False}
    # fake dims: bounded function of payload size; fake 4-bin byte histogram
    n = len(payload)
    hist = [0, 0, 0, 0]
    for b in payload[:4096]:
        hist[b & 3] += 1
    w = meta.get("declared_w")
    h = meta.get("declared_h")
    return {
        "width": w if w is not None else (n % 640) + 1,
        "height": h if h is not None else (n % 480) + 1,
        "channel_hist": hist,
        "ok": True,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, decoded features out.

    At scale: repartition upstream so each task holds a bounded byte volume
    (payloads can be MBs — size by bytes, not rows; see
    spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavyweight decoder init would happen HERE, once per task
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = {
                    "declared_w": row.meta.get("declared_w") if row.meta else None,
                    "declared_h": row.meta.get("declared_h") if row.meta else None,
                }
                d = decode_image_stub(row.payload, meta)
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "n_bytes": len(row.payload) if row.payload is not None else 0,
                        "width": d["width"],
                        "height": d["height"],
                        "channel_hist": d["channel_hist"],
                        "ok": d["ok"],
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: text bytes stand in
    for image payloads (no media files in the testdata)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("declared_w"),
            (F.col("n_chars") % 480).cast("int").alias("declared_h"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize media → mapInPandas decode → aggregate stats.
    Aggregated output keeps the driver check stable (per-row hist order
    is deterministic too, but the rollup is the realistic downstream)."""
    decoded = decode_media(synthetic_media(spark, sf_dir))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
            F.sum(F.element_at("channel_hist", 1)).alias("hist0_sum"),
            F.max("width").alias("max_w"),
        )
        .orderBy("media_type")
    )


MULTIMODAL_DECODE_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'image/jpeg'
              ELSE 'audio/wav' END AS media_type,
         ENCODE(text) AS payload,
         CAST(n_chars % 640 AS INT) AS declared_w,
         text
  FROM documents
),
decoded AS (
  -- text payloads are pure ASCII, so byte-level (b & 3) == ascii(char) % 4
  SELECT media_id, media_type,
         OCTET_LENGTH(payload) AS n_bytes,
         CASE WHEN OCTET_LENGTH(payload) = 0 THEN NULL
              ELSE declared_w END AS width,
         CASE WHEN OCTET_LENGTH(payload) > 0 THEN 1 ELSE 0 END AS ok,
         LEN(LIST_FILTER(
           LIST_TRANSFORM(GENERATE_SERIES(1, LEAST(LENGTH(text), 4096)),
                          i -> ASCII(SUBSTRING(text, i, 1)) % 4),
           v -> v = 0)) AS hist0
  FROM media
)
SELECT media_type,
       COUNT(*) AS n,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(ok) AS BIGINT) AS n_ok,
       CAST(SUM(hist0) AS BIGINT) AS hist0_sum,
       MAX(width) AS max_w
FROM decoded
GROUP BY media_type
ORDER BY media_type
"""


QUERIES = {
    "multimodal_decode": multimodal_decode,
}

ORACLE = {
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
}


def multimodal_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media pipeline: synthesize → resize → {frame-sample, feature-
    extract}, aggregated per media_type. Every stage fake is deterministic,
    so the whole mapInPandas chain is oracle-checkable in plain SQL.

    At scale the ``resized`` frame feeds three consumers — persist it (or
    write it to a staging table) so the resize pass runs once, not per
    consumer; at test SF recomputation is cheaper than the cache."""
    media = synthetic_media(spark, sf_dir)
    resized = resize_media(media)
    # frame/feature outputs drop media_type; media_id % 3 reconstructs it
    # (synthetic_media's own definition — not derivable for real media).
    mt = (
        F.when(F.col("media_id") % 3 == 0, "image/png")
        .when(F.col("media_id") % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
    )
    r_agg = resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).cast("long").alias("resized_bytes"),
    )
    f_agg = (
        sample_frames(resized)
        .groupBy(mt.alias("media_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("ts_ms").cast("long").alias("ts_ms_sum"),
            F.sum(F.octet_length("frame_payload")).cast("long").alias("frame_bytes"),
        )
    )
    feat_agg = (
        extract_features(resized)
        .groupBy(mt.alias("media_type"))
        .agg(F.round(F.avg(F.element_at("feature", 1)), 4).alias("avg_f1"))
    )
    return (
        r_agg.join(f_agg, "media_type")
        .join(feat_agg, "media_type")
        .orderBy("media_type")
    )


# The SQL mirrors each fake bit-for-bit: resize keeps a
# floor(len * min(1, 224*224/(w*h)))-byte prefix; frame sampling slices
# min(8, max(1, len//640)) chunks of len//n bytes with ts i*10000//30;
# features are a 16-bin byte histogram (+1 smoothing) L2-normalized.
# Text payloads are pure ASCII so ASCII(SUBSTRING(text,i,1)) == byte i.
MULTIMODAL_STAGES_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'image/jpeg'
              ELSE 'audio/wav' END AS media_type,
         text,
         OCTET_LENGTH(ENCODE(text)) AS n_bytes,
         CAST(n_chars % 640 AS BIGINT) AS dw,
         CAST(n_chars % 480 AS BIGINT) AS dh
  FROM documents
),
resized AS (
  SELECT media_id, media_type, text,
         CASE WHEN n_bytes = 0 THEN 0
              ELSE GREATEST(1, CAST(FLOOR(
                n_bytes * LEAST(1.0, 50176.0 / GREATEST(1, dw * dh))
              ) AS BIGINT))
         END AS keep
  FROM media
),
framed AS (
  SELECT media_type, keep,
         LEAST(8, GREATEST(1, keep // 640)) AS n_frames,
         GREATEST(1, keep // LEAST(8, GREATEST(1, keep // 640))) AS step
  FROM resized
),
frame_stats AS (
  SELECT media_type,
         CAST(SUM(n_frames) AS BIGINT) AS n_frames,
         CAST(SUM(LIST_SUM(LIST_TRANSFORM(
           GENERATE_SERIES(0, CAST(n_frames - 1 AS INT)),
           i -> (10000 * i) // 30))) AS BIGINT) AS ts_ms_sum,
         CAST(SUM(LEAST(keep, n_frames * step)) AS BIGINT) AS frame_bytes
  FROM framed GROUP BY media_type
),
feat_hist AS (
  SELECT media_type,
         LIST_TRANSFORM(GENERATE_SERIES(0, 15), k ->
           1.0 + LEN(LIST_FILTER(
             LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEAST(keep, 4096) AS INT)),
                            i -> ASCII(SUBSTRING(text, i, 1)) % 16),
             b -> b = k))) AS hist
  FROM resized
),
feat AS (
  SELECT media_type,
         hist[1] / SQRT(LIST_SUM(LIST_TRANSFORM(hist, h -> h * h))) AS f1
  FROM feat_hist
)
SELECT r.media_type, r.n_media, r.resized_bytes,
       f.n_frames, f.ts_ms_sum, f.frame_bytes,
       ft.avg_f1
FROM (SELECT media_type, COUNT(*) AS n_media,
             CAST(SUM(keep) AS BIGINT) AS resized_bytes
      FROM resized GROUP BY media_type) r
JOIN frame_stats f USING (media_type)
JOIN (SELECT media_type, ROUND(AVG(f1), 4) AS avg_f1
      FROM feat GROUP BY media_type) ft USING (media_type)
ORDER BY media_type
"""

QUERIES["multimodal_stages"] = multimodal_stages
ORACLE["multimodal_stages"] = MULTIMODAL_STAGES_SQL


# --- resize / frame-sample / feature-extract plumbing ----------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage over MEDIA_SCHEMA rows (mapInPandas, Arrow batches).

    REAL IMPLEMENTATION SITE: `PIL.Image.resize((target_w, target_h))` on
    the decoded pixels. The deterministic fake keeps a byte-budget
    contract real resizing also obeys: output payload is a prefix slice
    proportional to the pixel-count ratio, so downstream partition sizing
    (bytes per task) behaves like real thumbnails.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decoder/scaler init once per task — not per row
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload or b""
                src_w = (row.meta.get("declared_w") or 0) if row.meta else 0
                src_h = (row.meta.get("declared_h") or 0) if row.meta else 0
                src_px = max(1, src_w * src_h)
                ratio = min(1.0, (target_w * target_h) / src_px)
                keep = max(1, int(len(payload) * ratio)) if payload else 0
                out.append(
                    {
                        "media_id": row.media_id,
                        "media_type": row.media_type,
                        "width": target_w,
                        "height": target_h,
                        "payload": payload[:keep],
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, fps_divisor: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: one input row fans out to N
    frame rows (mapInPandas may yield MORE rows than it receives — the
    correct Spark shape for demux, vs a UDF which is 1:1).

    REAL IMPLEMENTATION SITE: pyav/ffmpeg demux at `keep every
    fps_divisor-th keyframe`. The fake slices the payload into equal
    chunks with deterministic timestamps so row counts, schemas and
    per-frame byte budgets match a real demux."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload or b""
                n_frames = min(max_frames, max(1, len(payload) // (64 * fps_divisor)))
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_no": i,
                            "ts_ms": i * 1000 * fps_divisor // 30,
                            "frame_payload": payload[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage: payload → fixed-dim float vector
    (mapInPandas; REAL IMPLEMENTATION SITE: a CLIP/ViT forward pass —
    the model would be loaded once per task, exactly where the comment
    sits, never per row). Deterministic fake: byte-histogram projection,
    L2-normalized, so downstream ANN plumbing gets realistic unit
    vectors."""
    import math

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model = load_model()  # once per task
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload or b""
                hist = [1.0] * FEATURE_DIM
                for b in payload[:4096]:
                    hist[b % FEATURE_DIM] += 1.0
                nrm = math.sqrt(sum(x * x for x in hist))
                out.append(
                    {
                        "media_id": row.media_id,
                        "feature": [x / nrm for x in hist],
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(feature_batches, schema=FEATURES_SCHEMA)


# --- multimodal → ANN chain -------------------------------------------------
#
# TODO-r4 item: the feature-extraction output feeding vector search as one
# chained plan, pinning that the mapInPandas stage boundary composes with
# the broadcast + TakeOrderedAndProject ANN shape (reference analogue:
# decoded media -> vector column -> VectorIndex query,
# dbms/src/Storages/DeltaMerge/Index/VectorIndex/).


def multimodal_ann_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media → resize (mapInPandas) → extract_features (mapInPandas) →
    exact cosine top-k vs media_id 0's feature.

    Exactness across engines: the Python fake computes features in double
    and Arrow rounds them to float32 (FEATURES_SCHEMA); the oracle mirrors
    that with an explicit CAST(... AS FLOAT[]) of the same double values —
    identical nearest-float32 rounding — then both engines score in double.

    Scale shape: the feature stage runs twice here (query row + corpus);
    a real deployment writes the feature table once (the IVF/vector-index
    at-rest treatment in pipeline/similarity.py) and this query becomes a
    pure index-side scan. The fusion itself is a 1-row broadcast against
    one narrow mapInPandas stage → TakeOrderedAndProject: no wide shuffle.
    """
    from tiflash_spark.functions.vector import vec_cosine_similarity

    feats = extract_features(resize_media(synthetic_media(spark, sf_dir)))
    as_double = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    q = feats.filter(F.col("media_id") == 0).select(
        as_double(F.col("feature")).alias("qv")
    )
    mt = (
        F.when(F.col("media_id") % 3 == 0, "image/png")
        .when(F.col("media_id") % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
    )
    scored = (
        feats.filter(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "media_id",
            mt.alias("media_type"),
            F.round(
                vec_cosine_similarity(as_double(F.col("feature")), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("media_id")).limit(10)


MULTIMODAL_ANN_CHAIN_SQL = """
WITH media AS (
  SELECT doc_id AS media_id,
         text,
         OCTET_LENGTH(ENCODE(text)) AS n_bytes,
         CAST(n_chars % 640 AS BIGINT) AS dw,
         CAST(n_chars % 480 AS BIGINT) AS dh
  FROM documents
),
resized AS (
  SELECT media_id, text,
         CASE WHEN n_bytes = 0 THEN 0
              ELSE GREATEST(1, CAST(FLOOR(
                n_bytes * LEAST(1.0, 50176.0 / GREATEST(1, dw * dh))
              ) AS BIGINT))
         END AS keep
  FROM media
),
feat_hist AS (
  SELECT media_id,
         LIST_TRANSFORM(GENERATE_SERIES(0, 15), k ->
           1.0 + LEN(LIST_FILTER(
             LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEAST(keep, 4096) AS INT)),
                            i -> ASCII(SUBSTRING(text, i, 1)) % 16),
             b -> b = k))) AS hist
  FROM resized
),
feat AS (
  -- double → float32 → double round-trip mirrors Arrow's cast of the
  -- Python-computed doubles into FEATURES_SCHEMA's array<float>
  SELECT media_id,
         CAST(CAST(LIST_TRANSFORM(hist, h ->
           h / SQRT(LIST_SUM(LIST_TRANSFORM(hist, x -> x * x))))
           AS FLOAT[]) AS DOUBLE[]) AS f
  FROM feat_hist
),
q AS (SELECT f AS qv FROM feat WHERE media_id = 0)
SELECT fe.media_id,
       CASE WHEN fe.media_id % 3 = 0 THEN 'image/png'
            WHEN fe.media_id % 3 = 1 THEN 'image/jpeg'
            ELSE 'audio/wav' END AS media_type,
       ROUND(LIST_COSINE_SIMILARITY(fe.f, q.qv), 6) AS cos_sim
FROM feat fe, q
WHERE fe.media_id <> 0
ORDER BY cos_sim DESC, fe.media_id
LIMIT 10
"""

QUERIES["multimodal_ann_chain"] = multimodal_ann_chain
ORACLE["multimodal_ann_chain"] = MULTIMODAL_ANN_CHAIN_SQL


# --- perceptual-hash near-dup over decoded media ----------------------------
#
# Image dedup in a training pipeline is pHash/dHash over DECODED pixels —
# exact byte dedup misses re-encodes; embedding dedup needs a model. The
# Spark shape is the SimHash machinery from pipeline/dedup.py applied to
# a hash computed inside the media decode stage: mapInPandas produces a
# 16-bit signature per media, exact-signature groupBy finds duplicates,
# and 4-bit band buckets give Hamming-tolerant candidates without any
# all-pairs join. REAL IMPLEMENTATION SITE: the signature fn below would
# be a DCT low-frequency pHash over decoded pixels; the deterministic
# fake (byte-histogram threshold bits) keeps the plumbing testable and
# SQL-mirrorable.

PHASH_BITS = 16
PHASH_BANDS = 4  # 4 bands x 4 bits: candidates within Hamming<=3 of a band


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash_stub(payload: bytes) -> int:
    """Deterministic fake perceptual hash: bit k of the signature is set
    iff byte-bucket k's count exceeds the mean bucket count (the same
    mean-threshold construction real pHash applies to DCT coefficients).
    Integer-only, so the SQL mirror is exact with no float round-trip."""
    payload = payload or b""
    hist = [0] * PHASH_BITS
    for b in payload[:4096]:
        hist[b % PHASH_BITS] += 1
    total = sum(hist)
    sig = 0
    for k in range(PHASH_BITS):
        if PHASH_BITS * hist[k] > total:  # hist[k] > mean, integer-exact
            sig |= 1 << k
    return sig


def phash_media(df: DataFrame) -> DataFrame:
    """mapInPandas signature stage over MEDIA_SCHEMA rows (decode and
    hash share one task: at scale the expensive decode runs once and
    every per-media signal — pHash, features, dims — is derived in the
    same pass). The per-row histogram + threshold runs in NumPy
    (bincount over the byte buffer), not a Python byte loop — identical
    integer arithmetic to phash_stub (pinned in test_multimodal), ~30×
    less Python interpreter work per payload."""
    import numpy as np

    weights = 1 << np.arange(PHASH_BITS, dtype=np.int64)

    def phash_one(payload) -> int:
        a = np.frombuffer(bytes(payload or b"")[:4096], dtype=np.uint8)
        hist = np.bincount(a % PHASH_BITS, minlength=PHASH_BITS)
        return int(weights[(PHASH_BITS * hist) > a.size].sum())

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": [phash_one(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(phash_batches, schema=PHASH_SCHEMA)


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media → pHash (mapInPandas) → exact-signature dup groups + banded
    near-dup candidate SIGNATURE pairs + Hamming-verified near pairs.
    One-row report: media/signature counts, exact-dup group/member
    counts, distinct banded candidates, candidates CONFIRMED at
    Hamming <= 3 (codegen bit_count(xor)), and SUM(phash) pinning every
    signature value.

    Scale: signature groupBy is a 2-byte-key shuffle with map-side
    combine. The band join runs over DISTINCT signatures, never rows —
    banding raw media rows would put every copy of a popular signature
    in the same 4-bit bucket and the join would blow up quadratically in
    the duplicate counts (measured: 13 s vs 0.3 s at sf0.1). Exact
    duplicates are already grouped by the groupBy; the banded join's job
    is only to propose near-miss signature pairs for Hamming
    verification, and there are at most 2^PHASH_BITS nodes.

    The decode+hash pass (mapInPandas) runs ONCE: every report column
    derives from the ≤2^PHASH_BITS-row (phash, n) table — the corpus
    stats as SUM(n)/SUM(phash·n) rather than a second pass over raw
    media — and that tiny table is persisted so the exact/band/verify
    branches don't each re-decode the corpus (the plan had FOUR
    MapInPandas scans; at scale each is a full media decode). Same
    CacheManager-keyed-by-plan reuse story as curation_pipeline."""
    sigs = phash_media(synthetic_media(spark, sf_dir)).select("media_id", "phash")
    by_sig = sigs.groupBy("phash").agg(F.count(F.lit(1)).alias("n")).persist()
    exact = by_sig.agg(
        F.count(F.lit(1)).cast("long").alias("n_sigs"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_dup_media"),
    )
    base = by_sig.agg(
        F.sum("n").cast("long").alias("n_media"),
        F.sum(F.col("phash") * F.col("n")).cast("long").alias("sig_digest"),
    )
    bands = by_sig.select(
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("b"),
                        F.shiftright("phash", 4 * i).bitwiseAND(15).alias("v"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("phash", "bv.b", "bv.v")
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.b") == F.col("r.b"))
            & (F.col("l.v") == F.col("r.v"))
            & (F.col("l.phash") < F.col("r.phash")),
        )
        .select(F.col("l.phash").alias("a"), F.col("r.phash").alias("bs"))
        .distinct()
    )
    # verification stage: banding only PROPOSES; Hamming <= 3 CONFIRMS
    # (codegen bit_count over xor — the SimHash verify rule)
    pairs = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_band_sig_pairs"),
        F.sum(
            (F.bit_count(F.col("a").bitwiseXOR(F.col("bs"))) <= 3).cast("long")
        ).cast("long").alias("n_near_sig_pairs"),
    )
    return (
        base.crossJoin(exact)
        .crossJoin(pairs)
        .select(
            "n_media", "n_sigs", "n_dup_groups", "n_dup_media",
            "n_band_sig_pairs", "n_near_sig_pairs", "sig_digest",
        )
    )


MULTIMODAL_PHASH_SQL = """
WITH hist AS (
  SELECT doc_id AS media_id,
         LIST_TRANSFORM(GENERATE_SERIES(0, 15), k ->
           LEN(LIST_FILTER(
             LIST_TRANSFORM(GENERATE_SERIES(1, CAST(LEAST(OCTET_LENGTH(ENCODE(text)), 4096) AS INT)),
                            i -> ASCII(SUBSTRING(text, i, 1)) % 16),
             b -> b = k))) AS h
  FROM documents
),
sigs AS (
  SELECT media_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 16), k ->
           CASE WHEN 16 * h[k] > LIST_SUM(h) THEN 1 << (k - 1) ELSE 0 END))
           AS BIGINT) AS phash
  FROM hist
),
by_sig AS (
  SELECT phash, COUNT(*) AS n FROM sigs GROUP BY phash
),
bands AS (
  SELECT phash, i AS b, (phash >> (4 * CAST(i AS INT))) & 15 AS v
  FROM by_sig, UNNEST(GENERATE_SERIES(0, 3)) AS t(i)
),
cand AS (
  SELECT DISTINCT l.phash AS a, r.phash AS bs
  FROM bands l JOIN bands r
    ON l.b = r.b AND l.v = r.v AND l.phash < r.phash
),
pairs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_band_sig_pairs,
         CAST(SUM(CASE WHEN bit_count(xor(a, bs)) <= 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_near_sig_pairs
  FROM cand
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sigs) AS n_media,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM by_sig) AS n_sigs,
       (SELECT CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM by_sig)
         AS n_dup_groups,
       (SELECT CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) FROM by_sig)
         AS n_dup_media,
       (SELECT n_band_sig_pairs FROM pairs) AS n_band_sig_pairs,
       (SELECT COALESCE(n_near_sig_pairs, 0) FROM pairs) AS n_near_sig_pairs,
       (SELECT CAST(SUM(phash) AS BIGINT) FROM sigs) AS sig_digest
"""

QUERIES["multimodal_phash"] = multimodal_phash_dedup
ORACLE["multimodal_phash"] = MULTIMODAL_PHASH_SQL

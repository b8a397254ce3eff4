"""Dedup verification: the sketch tiers (MinHash-LSH, SimHash) against the
exact n-gram Jaccard ground truth — the reference-style adversarial check
(its executor gtests assert result-set equality; approximate operators get
recall/precision bounds instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM
from tiflash_spark.pipeline.dedup import (
    dedup_exact,
    dedup_minhash,
    dedup_ngram_jaccard,
    dedup_simhash,
)


def _pairs(df, cols=("doc_a", "doc_b")):
    return {(r[0], r[1]) for r in df.select(*cols).collect()}


def test_exact_dedup_counts(spark):
    row = dedup_exact(spark, SF_MEDIUM).collect()[0]
    assert row.n_total_docs == row.n_unique_docs + row.n_removed
    assert row.n_unique_docs > 0


def test_minhash_contains_high_jaccard_pairs(spark):
    """Every prefix-blocked pair with Jaccard >= 0.8 must be found by LSH
    (16 hashes / 4 bands: P(miss at s=0.8) = (1-0.8^4)^4 ≈ 11%; the
    corpus's near-dups are mutations well above 0.8 or below threshold —
    assert recall >= 0.7 to stay robust to corpus changes)."""
    truth = dedup_ngram_jaccard(spark, SF_MEDIUM)
    strong = _pairs(truth.filter(F.col("jaccard") >= 0.8))
    found = _pairs(dedup_minhash(spark, SF_MEDIUM))
    if strong:
        recall = len(strong & found) / len(strong)
        assert recall >= 0.7, f"LSH recall {recall} over {len(strong)} strong pairs"


def test_minhash_pairs_verified(spark):
    """Everything MinHash emits passed exact-Jaccard >= 0.5 verification —
    precision is 1.0 by construction; check the query enforces it."""
    out = dedup_minhash(spark, SF_MEDIUM).collect()
    assert all(r.jaccard >= 0.5 for r in out)
    assert all(r.doc_a < r.doc_b for r in out)


def test_simhash_finds_near_dups(spark):
    """SimHash candidates overlap the exact near-dup set, and every emitted
    pair is within the declared Hamming radius."""
    out = dedup_simhash(spark, SF_MEDIUM).collect()
    assert all(r.hamming <= 6 for r in out)
    truth = _pairs(dedup_ngram_jaccard(spark, SF_MEDIUM).filter(F.col("jaccard") >= 0.9))
    found = {(r.doc_a, r.doc_b) for r in out}
    if truth:
        assert len(truth & found) / len(truth) >= 0.5


def test_no_self_pairs(spark):
    for df in (dedup_minhash(spark, SF_MEDIUM), dedup_simhash(spark, SF_MEDIUM)):
        assert df.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_clusters_match_union_find(spark):
    """Distributed label propagation must produce exactly the components a
    driver-side union-find builds from the same edges."""
    from tiflash_spark.pipeline.dedup import connected_components

    edges = dedup_ngram_jaccard(spark, SF_MEDIUM)
    edge_list = [(r.doc_a, r.doc_b) for r in edges.collect()]

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edge_list:
        union(a, b)
    expected = {}
    for n in parent:
        expected.setdefault(find(n), set()).add(n)
    expected_sets = {frozenset(v) for v in expected.values()}

    got = {}
    for r in connected_components(edges).collect():
        got.setdefault(r.comp, set()).add(r.doc_id)
    got_sets = {frozenset(v) for v in got.values()}
    assert got_sets == expected_sets
    # component label is the min member (hash-min convergence property)
    for comp, members in got.items():
        assert comp == min(members)


def test_embedding_dedup_lsh_recall_on_planted_neardups(spark):
    """Multi-table hyperplane LSH must recover planted near-duplicates:
    100 deterministic pseudo-random base vectors + 20 small perturbations
    (cosine ≈ 0.99 to their source). The OR-construction over 4 tables
    should catch >= 80% of the planted pairs; the exact tier catches all."""
    import math

    from pyspark.sql import Row

    from tiflash_spark.pipeline.dedup import embedding_lsh_pairs

    def prng(seed):
        x = seed
        while True:
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield ((x >> 33) / float(1 << 31)) - 1.0

    rows = []
    planted = set()
    for i in range(100):
        g = prng(i + 1)
        v = [next(g) for _ in range(64)]
        rows.append(Row(vec_id=i, embedding=v))
        if i < 20:
            # small deterministic perturbation: cosine stays ~0.99+
            p = [x + 0.02 * ((j % 5) - 2) for j, x in enumerate(v)]
            rows.append(Row(vec_id=1000 + i, embedding=p))
            planted.add((i, 1000 + i))
    df = spark.createDataFrame(rows)
    pairs = embedding_lsh_pairs(df).filter("cos_sim >= 0.95")
    found = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    hit = planted & found
    assert len(hit) >= 16, f"planted recall too low: {len(hit)}/20"
    # and no garbage: every surfaced >=0.95 pair is a planted one here
    assert found <= planted


def test_auto_band_params_tiers():
    """Band parameters grow with the corpus (round-9 10× probe finding:
    fixed params → occupancy² candidate growth); the s-curve threshold
    (1/b)^(1/r) stays ≈0.7 at every tier, so the measured recall curve
    (SCALING.md) carries over."""
    from tiflash_spark.pipeline.dedup import auto_band_params

    assert auto_band_params(500) == (4, 4)
    assert auto_band_params(5_000) == (4, 4)  # sf0.1 keeps measured point
    assert auto_band_params(50_000) == (5, 5)  # the 10× probe's corpus
    assert auto_band_params(1_000_000) == (6, 6)
    assert auto_band_params(100_000_000) == (7, 7)
    for n in (500, 50_000, 1_000_000, 100_000_000):
        b, r = auto_band_params(n)
        thr = (1.0 / b) ** (1.0 / r)
        assert 0.68 <= thr <= 0.78


def test_minhash_band_index_join_is_exchange_free(spark):
    """The persisted band index is bucketed by bh; the candidate
    self-join keys on (band, bh) ⊇ {bh}, so with broadcast disabled the
    join runs bucket-co-located with ZERO shuffle exchanges (the
    property that makes LSH candidate generation viable on a
    corpus-sized signature table). At tiny SF the planner may instead
    broadcast — also shuffle-free — so the pin forces the shuffle path."""
    from pyspark.sql import functions as F

    from tiflash_spark.pipeline.dedup import minhash_band_index

    banded = minhash_band_index(spark, "/root/testdata/sf0.001")
    a, b = banded.alias("a"), banded.alias("b")
    j = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan, plan[:1200]
    assert "Exchange hashpartitioning" not in plan, plan[:1200]


def test_exact_substring_span_semantics(spark, tmp_path):
    """Constructed corpus pins the ExactSubstr drop-all semantics: a
    duplicated K-gram marks all its occurrences; overlapping duplicated
    positions merge into one span; unique text survives untouched."""
    import os

    from pyspark.sql import Row

    from tiflash_spark.pipeline.dedup import EXACT_SUBSTR_K, dedup_exact_substring

    K = EXACT_SUBSTR_K
    shared = " ".join(f"s{i}" for i in range(K + 2))      # K+2 shared tokens
    uniq_a = " ".join(f"a{i}" for i in range(5))
    uniq_b = " ".join(f"b{i}" for i in range(5))
    uniq_c = " ".join(f"c{i}" for i in range(K + 5))
    docs = [
        Row(doc_id=1, text=f"{uniq_a} {shared}", lang="en", source="s1",
            n_chars=0),
        Row(doc_id=2, text=f"{shared} {uniq_b}", lang="en", source="s1",
            n_chars=0),
        Row(doc_id=3, text=uniq_c, lang="en", source="s1", n_chars=0),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r.source: r for r in dedup_exact_substring(spark, sf).collect()}
    r = got["s1"]
    # docs 1+2 share a (K+2)-token run → 3 duplicated gram positions each,
    # merging to one span of K+2 removed tokens per doc; doc 3 untouched
    assert r.n_docs == 3 and r.n_affected == 2
    assert r.n_dup_positions == 6
    assert r.removed_tokens == 2 * (K + 2)
    assert r.kept_tokens == (5 + K + 2) * 2 + (K + 5) - 2 * (K + 2)


def test_exact_substring_shuffle_shape(spark):
    """Scale fence: one gram-window shuffle, one doc groupBy, one source
    agg + sort — no self-join, no cartesian anywhere."""
    from tiflash_spark.plans.explain import exchange_count, formatted_plan
    from tiflash_spark.pipeline.dedup import dedup_exact_substring

    df = dedup_exact_substring(spark, "/root/testdata/sf0.001")
    assert exchange_count(df) <= 5
    assert "CartesianProduct" not in formatted_plan(df)


def test_semantic_dedup_cluster_semantics(spark):
    """SemDeDup invariants on the real embeddings table: every vector
    lands in exactly one cluster, seed vectors land in their own cluster
    with cos 1.0, and each reported top pair is intra-cluster maximal."""
    from tiflash_spark.pipeline.dedup import SEMDEDUP_CLUSTERS, dedup_semantic

    rows = dedup_semantic(spark, "/root/testdata/sf0.001").collect()
    assert {r.cluster_id for r in rows} <= set(range(SEMDEDUP_CLUSTERS))
    assert sum(r.n_members for r in rows) == 500  # partition of the table
    for r in rows:
        assert 0 < r.n_members
        assert -1.0 <= r.avg_cos_centroid <= 1.0
        if r.top_a is not None:
            assert r.top_a < r.top_b and -1.0 <= r.top_cos <= 1.0


def test_semantic_dedup_no_cross_product(spark):
    """The pair join must be keyed on cluster_id (sum of cluster² work),
    never a cartesian over the table."""
    from tiflash_spark.plans.explain import formatted_plan
    from tiflash_spark.pipeline.dedup import dedup_semantic

    plan = formatted_plan(dedup_semantic(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan


def test_exact_substring_tokenhash_matches_string_grams(spark):
    """Session-3 pin: the two-level token-hash gram key (xxhash64 over a
    staged per-token hash array) marks EXACTLY the duplicate positions
    the gram-STRING key marks — same equality classes, since whitespace
    tokenization means string-equality of the joined gram ⟺ array
    equality of its tokens. Edge rows: multi-space runs, a within-doc
    repeat, a cross-doc repeat, a doc of exactly K tokens."""
    from pyspark.sql import Row, Window

    from tiflash_spark.pipeline.dedup import EXACT_SUBSTR_K
    from tiflash_spark.pipeline.text import tokens

    K = EXACT_SUBSTR_K
    run = " ".join(f"r{i}" for i in range(K))
    docs = [
        Row(doc_id=1, text=f"{run}  extra   tokens {run}"),   # within-doc repeat + multi-space
        Row(doc_id=2, text=f"lead {run} tail0 tail1"),        # cross-doc repeat
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(K))),  # exactly K, unique
    ]
    d = spark.createDataFrame(docs)
    toks = d.select("doc_id", tokens(F.col("text")).alias("w")).where(F.size("w") >= K)

    def dup_positions(grams):
        w = Window.partitionBy("gh")
        got = (
            grams.withColumn("n", F.count(F.lit(1)).over(w))
            .where(F.col("n") > 1)
            .select("doc_id", "pos")
            .collect()
        )
        return {(r.doc_id, r.pos) for r in got}

    string_grams = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(0, size(w) - {K}),"
            f" i -> struct(CAST(i AS BIGINT) AS pos,"
            f" xxhash64(concat_ws(' ', slice(w, i + 1, {K}))) AS gh))"
        )).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    tokhash_grams = (
        toks.select("doc_id", F.expr("transform(w, t -> xxhash64(t))").alias("th"))
        .select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, size(th) - {K}),"
                f" i -> struct(CAST(i AS BIGINT) AS pos,"
                f" xxhash64(slice(th, i + 1, {K})) AS gh))"
            )).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gh").alias("gh"))
    )
    want = dup_positions(string_grams)
    got = dup_positions(tokhash_grams)
    assert got == want and len(want) > 0

"""Measure the recall/latency trade of every ANN tier against brute force.

The four tiers (pipeline/similarity.py) answer the same top-k question at
different scale points: brute force (exact, full scan), LSH prefix bucket
(~1/2^PREFIX_BITS of the corpus), IVF n-probe over the persisted
cluster-partitioned index (N_PROBE/N_CENTROIDS at file-listing level),
and int8 scalar-quantized re-rank (4x memory). This script scores them
over NUM_QUERIES query vectors: mean recall@K vs the exact answer and
mean per-query wall seconds. Results go into SCALING.md's ANN section —
the justification minhash_curve.py gives the dedup sketch tiers.

Usage: python scripts/ann_recall_curve.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

NUM_QUERIES = 16
PROBE_SWEEP = (1, 2, 4, 8)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tiflash_spark.catalog import load_table
    from tiflash_spark.functions.vector import vec_cosine_similarity, vec_l2_distance
    from tiflash_spark.pipeline.similarity import (
        NUM_TABLES,
        PREFIX_BITS,
        TOP_K,
        _as_double,
        _dequantized,
        _quant_scales,
        lsh_buckets,
        vector_index,
    )
    from tiflash_spark.session import get_spark

    spark = get_spark("ann_recall_curve", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    e = load_table(spark, sf, "embeddings").persist()
    n = e.count()
    qids = [r.vec_id for r in e.select("vec_id").orderBy("vec_id").limit(NUM_QUERIES).collect()]

    def qvec(qid):
        return e.filter(F.col("vec_id") == qid).select(
            _as_double(F.col("embedding")).alias("qv")
        )

    def topk_ids(scored) -> list[int]:
        return [
            r.vec_id
            for r in scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
            .limit(TOP_K)
            .collect()
        ]

    def brute(qid) -> list[int]:
        scored = (
            e.filter(F.col("vec_id") != qid)
            .crossJoin(F.broadcast(qvec(qid)))
            .select(
                "vec_id",
                vec_cosine_similarity(_as_double(F.col("embedding")), F.col("qv")).alias("cos_sim"),
            )
        )
        return topk_ids(scored)

    tabbed = e.select(
        "vec_id", "embedding",
        F.posexplode(lsh_buckets(F.col("embedding"), 64)).alias("t", "bucket"),
    ).persist()
    tabbed.count()

    def lsh(qid) -> list[int]:
        q = tabbed.filter(F.col("vec_id") == qid).select(
            F.col("t").alias("qt"),
            F.col("bucket").alias("qbucket"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        cands = (
            tabbed.filter(F.col("vec_id") != qid)
            .join(
                F.broadcast(q),
                (F.col("t") == F.col("qt")) & (F.col("bucket") == F.col("qbucket")),
            )
            .dropDuplicates(["vec_id"])
        )
        return topk_ids(
            cands.select(
                "vec_id",
                vec_cosine_similarity(_as_double(F.col("embedding")), F.col("qv")).alias("cos_sim"),
            )
        )

    cents, assigned = vector_index(spark, sf)

    def ivf(qid, n_probe) -> list[int]:
        probe_ids = [
            r.cid
            for r in cents.crossJoin(F.broadcast(qvec(qid)))
            .withColumn("qdist", vec_l2_distance(F.col("cvec"), F.col("qv")))
            .orderBy(F.col("qdist").asc(), F.col("cid").asc())
            .limit(n_probe)
            .select("cid")
            .collect()
        ]
        cands = assigned.where(
            F.col("cluster").isin(probe_ids) & (F.col("vec_id") != qid)
        )
        return topk_ids(
            cands.crossJoin(F.broadcast(qvec(qid))).select(
                "vec_id",
                vec_cosine_similarity(_as_double(F.col("embedding")), F.col("qv")).alias("cos_sim"),
            )
        )

    scales = _quant_scales(e).persist()
    scales.count()

    def quant(qid) -> list[int]:
        q = (
            e.filter(F.col("vec_id") == qid)
            .crossJoin(F.broadcast(scales))
            .select(
                _dequantized(F.col("embedding"), F.col("mins"), F.col("maxs")).alias("qv_q")
            )
        )
        scored = (
            e.filter(F.col("vec_id") != qid)
            .crossJoin(F.broadcast(scales))
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                vec_cosine_similarity(
                    _dequantized(F.col("embedding"), F.col("mins"), F.col("maxs")),
                    F.col("qv_q"),
                ).alias("cos_sim"),
            )
        )
        return topk_ids(scored)

    import numpy as np

    from tiflash_spark.pipeline.similarity import PQ_K, PQ_M, PQ_OVERFETCH, pq_index

    books, codes = pq_index(spark, sf)
    codes = codes.persist()
    codes.count()
    qvecs = {
        r.vec_id: np.array(r.v, dtype=np.float64)
        for r in e.filter(F.col("vec_id").isin(qids))
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .collect()
    }

    def pq(qid) -> list[int]:
        q = qvecs[qid]
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        dsub = len(q) // PQ_M
        lut = [
            [float(np.dot(q[m * dsub:(m + 1) * dsub], books[m][k]))
             for k in range(PQ_K)]
            for m in range(PQ_M)
        ]
        lut_sql = "array({})".format(
            ", ".join("array({})".format(", ".join(f"{v!r}D" for v in row))
                      for row in lut)
        )
        adc = F.expr(
            "aggregate(sequence(0, {M}), cast(0.0 as double),"
            " (acc, m) -> acc + element_at(element_at({LUT}, m + 1),"
            " codes[m] + 1))".format(M=PQ_M - 1, LUT=lut_sql)
        )
        cands = (
            codes.filter(F.col("vec_id") != qid)
            .select("vec_id", adc.alias("adc"))
            .orderBy(F.col("adc").desc(), F.col("vec_id"))
            .limit(TOP_K * PQ_OVERFETCH)
        )
        return topk_ids(
            cands.join(e.select("vec_id", "embedding"), "vec_id")
            .crossJoin(F.broadcast(qvec(qid)))
            .select(
                "vec_id",
                vec_cosine_similarity(
                    _as_double(F.col("embedding")), F.col("qv")
                ).alias("cos_sim"),
            )
        )

    # truth + baseline latency
    t0 = time.time()
    truth = {qid: set(brute(qid)) for qid in qids}
    brute_s = (time.time() - t0) / len(qids)

    tiers: list[tuple[str, float, float]] = [("brute (exact)", 1.0, brute_s)]

    def score(name, fn):
        t0 = time.time()
        rec = []
        for qid in qids:
            got = set(fn(qid))
            rec.append(len(got & truth[qid]) / TOP_K)
        tiers.append((name, sum(rec) / len(rec), (time.time() - t0) / len(qids)))

    score(f"LSH {NUM_TABLES}x{PREFIX_BITS}-bit tables", lsh)
    for p in PROBE_SWEEP:
        score(f"IVF n_probe={p}", lambda qid, p=p: ivf(qid, p))

    # graph-navigated coarse step (the HNSW-shaped tier): NSW walk over
    # the persisted centroid graph instead of scoring every centroid
    from tiflash_spark.pipeline.similarity import (
        N_PROBE,
        centroid_graph,
        graph_probe,
    )

    cent_vecs = {int(r.cid): list(r.cvec) for r in cents.collect()}
    graph = centroid_graph(spark, sf, cents)

    def ivf_graph(qid) -> list[int]:
        probe_ids = graph_probe(graph, cent_vecs, list(qvecs[qid]), N_PROBE)
        cands = assigned.where(
            F.col("cluster").isin(probe_ids) & (F.col("vec_id") != qid)
        )
        return topk_ids(
            cands.crossJoin(F.broadcast(qvec(qid))).select(
                "vec_id",
                vec_cosine_similarity(
                    _as_double(F.col("embedding")), F.col("qv")
                ).alias("cos_sim"),
            )
        )

    score(f"IVF graph-walk n_probe={N_PROBE} (NSW M=4)", ivf_graph)
    score("int8 quantized", quant)
    score(f"PQ-ADC {PQ_M}x{PQ_K} (overfetch {PQ_OVERFETCH})", pq)

    print(f"\nANN recall@{TOP_K} over {len(qids)} queries, {n} vectors ({sf}):\n")
    print("| tier | recall@10 | s/query |")
    print("|---|---|---|")
    for name, rec, secs in tiers:
        print(f"| {name} | {rec:.3f} | {secs:.2f} |")


if __name__ == "__main__":
    main()

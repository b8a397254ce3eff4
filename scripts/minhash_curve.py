"""Measure the MinHash-LSH recall/cost curve across (bands, rows) configs.

Ground truth: exact all-pairs n-gram Jaccard >= 0.5 (the dedup_ngram
ground-truth tier, computed here without the prefix block so recall is
against the TRUE pair set at this scale). For each config we report:
candidate pairs generated (cost driver: verify-join input), verified pairs,
recall vs truth, and wall seconds. Results go into SCALING.md's dedup
section.

Usage: python scripts/minhash_curve.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tiflash_spark.catalog import load_table
    from tiflash_spark.pipeline.dedup import minhash_candidates, word_bigrams
    from tiflash_spark.session import get_spark

    spark = get_spark("minhash_curve", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf, "documents")
    docs = d.select("doc_id", word_bigrams(F.col("text")).alias("sh")).persist()
    docs.count()

    sh_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))

    def verified(cand):
        pairs = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
        inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return pairs.select("doc_a", "doc_b").where((inter / union) >= 0.5)

    # exact truth: full cross self-join on doc_id ordering (no blocking) —
    # feasible at bench scale, and the point is measuring LSH against truth
    truth = (
        sh_a.crossJoin(sh_b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            (
                F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
                / (
                    F.size("sh_a")
                    + F.size("sh_b")
                    - F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
                )
            )
            >= 0.5
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    n_truth = truth.count()
    print(f"truth pairs (jaccard>=0.5): {n_truth}")

    for bands, rows in [(3, 3), (4, 4), (5, 5), (8, 2), (2, 8)]:
        t0 = time.time()
        cand = minhash_candidates(docs, bands=bands, rows=rows).persist()
        n_cand = cand.count()
        ver = verified(cand).persist()
        n_ver = ver.count()
        hit = ver.join(truth, ["doc_a", "doc_b"]).count()
        dt = time.time() - t0
        thr = (1.0 / bands) ** (1.0 / rows)
        print(
            f"bands={bands} rows={rows} (K={bands*rows}, s-thr≈{thr:.2f}): "
            f"candidates={n_cand} verified={n_ver} "
            f"recall={hit}/{n_truth}={hit/max(n_truth,1):.3f} wall={dt:.1f}s"
        )
        cand.unpersist()
        ver.unpersist()


if __name__ == "__main__":
    main()

"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north_star): dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (tokens / quality /
lang-id / fingerprints), and multimodal binary-column plumbing — all
designed for the 100 TB case: hash-partitioned blocking instead of O(n²)
pairs, JVM-side higher-order array expressions instead of Python UDFs,
Arrow-batched Pandas UDFs where Python is unavoidable.
"""

"""Storage layer — DeltaTree-style MVCC tables over Parquet."""

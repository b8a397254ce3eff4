"""TiDB VECTOR (array<float>) distance functions, Spark-first.

Reference (SURVEY.md §2.4 'Vector'): VecDims / VecL1Distance / VecL2Distance /
VecCosineDistance / VecNegativeInnerProduct / VecL2Norm / VecAsText —
dbms/src/Functions/FunctionsVector.cpp; storage-side ANN index is HNSW
(dbms/src/Storages/DeltaMerge/Index/VectorIndex/CommonUtil.h:41-52).

Spark-first: pure higher-order array expressions (F.zip_with + F.aggregate)
— stays in the JVM, vectorizes under codegen, and distributes with no UDF
serialization. Brute-force top-k ANN = distance + TakeOrderedAndProject
(see pipeline/similarity.py for the LSH-bucketed scale path).

NULL/size-mismatch semantics: mismatched dimensions → NULL (the reference
throws; for an analytics engine NULL-out is the MySQL-compatible soft mode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fsum(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)


def _guard(a: Column, b: Column, expr: Column) -> Column:
    return F.when(F.size(a) == F.size(b), expr)


def vec_dims(a: Column) -> Column:
    return F.size(a)


def vec_l2_norm(a: Column) -> Column:
    return F.sqrt(_fsum(F.transform(a, lambda x: x * x)))


def vec_l1_distance(a: Column, b: Column) -> Column:
    return _guard(a, b, _fsum(F.zip_with(a, b, lambda x, y: F.abs(x - y))))


def vec_l2_distance(a: Column, b: Column) -> Column:
    return _guard(a, b, F.sqrt(_fsum(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)))))


def vec_inner_product(a: Column, b: Column) -> Column:
    return _guard(a, b, _fsum(F.zip_with(a, b, lambda x, y: x * y)))


def vec_negative_inner_product(a: Column, b: Column) -> Column:
    return -vec_inner_product(a, b)


def vec_cosine_distance(a: Column, b: Column) -> Column:
    """1 - cos(a, b); NULL when a zero vector makes it undefined."""
    denom = vec_l2_norm(a) * vec_l2_norm(b)
    return _guard(a, b, F.when(denom != 0, 1 - vec_inner_product(a, b) / denom))


def vec_cosine_similarity(a: Column, b: Column) -> Column:
    denom = vec_l2_norm(a) * vec_l2_norm(b)
    return _guard(a, b, F.when(denom != 0, vec_inner_product(a, b) / denom))


def vec_as_text(a: Column) -> Column:
    """VecAsText: '[x1,x2,...]' rendering."""
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(a, lambda x: x.cast("string")), ","),
        F.lit("]"),
    )

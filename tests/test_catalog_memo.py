"""Physical-schema memo (catalog.read_parquet_memo): correctness of the
round-10 planning-latency optimization — reads carry the exact file
schema, the memo invalidates when the file changes, and load_table's
output schema is identical with and without a warm memo."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_memo_matches_inferred_schema(spark):
    from tiflash_spark import catalog

    for name in ("lineitem", "documents", "embeddings"):
        path = f"{SF_SMALL}/{name}.parquet"
        cold = spark.read.parquet(path).schema
        memo = catalog.read_parquet_memo(spark, path).schema
        again = catalog.read_parquet_memo(spark, path).schema
        assert memo == cold
        assert again == cold


def test_memo_invalidates_on_rewrite(spark, tmp_path):
    from pyspark.sql import Row

    from tiflash_spark import catalog

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([Row(a=1)]).write.mode("overwrite").parquet(p)
    assert catalog.read_parquet_memo(spark, p).schema.fieldNames() == ["a"]
    # rewrite with a different schema: (path, mtime, size) key must miss
    spark.createDataFrame([Row(a=1, b="x")]).write.mode("overwrite").parquet(p)
    spark.catalog.refreshByPath(p)
    assert set(catalog.read_parquet_memo(spark, p).schema.fieldNames()) == {"a", "b"}


def test_load_table_rows_identical_with_memo(spark):
    from tiflash_spark import catalog

    # events exercises the nanos-normalization branch on top of the memo
    for name in ("events", "lineitem"):
        df1 = catalog.load_table(spark, SF_SMALL, name)  # may warm the memo
        df2 = catalog.load_table(spark, SF_SMALL, name)  # memo hit
        assert df1.schema == df2.schema
        assert df1.orderBy(df1.columns[0]).head(3) == df2.orderBy(df2.columns[0]).head(3)

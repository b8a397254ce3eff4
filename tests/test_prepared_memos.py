"""The r11 driver-work memos: prepared() expression reuse and
literal_memo() plan-literal reuse.

Both cache plan-construction artifacts only — never query results — and
literal_memo must invalidate when its source parquet is rewritten in
place, exactly like read_parquet_memo / the sidecar _SOURCE_STAMPs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiflash_spark.catalog import _PLAN_LITERALS, literal_memo
from tiflash_spark.pipeline.text import _PREPARED, prepared


def test_prepared_returns_same_object(spark):
    calls = []

    def build():
        calls.append(1)
        return F.col("x") + 1

    a = prepared(("test", "same-object"), build)
    b = prepared(("test", "same-object"), build)
    assert a is b
    assert len(calls) == 1


def test_prepared_column_usable_in_multiple_plans(spark):
    c = prepared(("test", "usable"), lambda: (F.col("v") * 2).alias("d"))
    df1 = spark.range(3).select(F.col("id").alias("v")).select(c)
    df2 = spark.range(5).select(F.col("id").alias("v")).select(c)
    assert [r.d for r in df1.collect()] == [0, 2, 4]
    assert [r.d for r in df2.collect()] == [0, 2, 4, 6, 8]


def test_literal_memo_caches_per_stamp(tmp_path):
    src = tmp_path / "t.parquet"
    src.write_bytes(b"one")
    calls = []

    def build():
        calls.append(1)
        return [1, 2, 3]

    assert literal_memo(str(src), "tag", build) == [1, 2, 3]
    assert literal_memo(str(src), "tag", build) == [1, 2, 3]
    assert len(calls) == 1


def test_literal_memo_invalidates_on_rewrite(tmp_path):
    src = tmp_path / "t.parquet"
    src.write_bytes(b"one")
    vals = iter(["first", "second"])
    build = lambda: next(vals)  # noqa: E731
    assert literal_memo(str(src), "rw", build) == "first"
    # rewrite IN PLACE with different size -> different (mtime, size) key
    src.write_bytes(b"rewritten-longer")
    assert literal_memo(str(src), "rw", build) == "second"


def test_literal_memo_missing_source_never_caches(tmp_path):
    gone = tmp_path / "absent.parquet"
    calls = []

    def build():
        calls.append(1)
        return 42

    assert literal_memo(str(gone), "x", build) == 42
    assert literal_memo(str(gone), "x", build) == 42
    assert len(calls) == 2  # no stat -> no key -> rebuilt each time


def test_memos_hold_no_dataframes():
    """The memos carry plan artifacts (Columns, scalars, lists), never
    DataFrames/results keyed on testdata rows."""
    from pyspark.sql import DataFrame

    for v in list(_PLAN_LITERALS.values()):
        assert not isinstance(v, DataFrame)
    for v in list(_PREPARED.values()):
        assert not isinstance(v, DataFrame)

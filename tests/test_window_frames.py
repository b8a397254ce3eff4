"""FIXTURES.md group E — window-frame coverage on a nasty table: ties in
the ORDER BY key, NULLs in the value column, every boundary kind
(WindowDescription.h:44-94), cross-checked against DuckDB row-for-row."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from tiflash_spark.testing import normalize_rows

ROWS = []
for pk in (1, 2):
    for i in range(12):
        ROWS.append(
            {
                "pk": pk,
                "ord": (i // 3) * 10,  # ties: groups of 3 share an ord
                "rid": pk * 100 + i,  # unique tiebreak
                "val": None if i % 5 == 4 else float(i * 7 % 23),
            }
        )
PDF = pd.DataFrame(ROWS)


@pytest.fixture(scope="module")
def wtab(spark):
    sdf = spark.createDataFrame(PDF.astype(object).where(pd.notnull(PDF), None))
    con = duckdb.connect()
    con.register("wt", PDF)
    return sdf, con


def check(spark_df, con, sql, name):
    assert normalize_rows(spark_df.toPandas()) == normalize_rows(con.execute(sql).fetchdf()), name


def test_ranking_with_ties(wtab):
    sdf, con = wtab
    w = Window.partitionBy("pk").orderBy("ord", "rid")
    wt = Window.partitionBy("pk").orderBy("ord")  # ties: rank vs dense_rank vs row_number
    out = sdf.select(
        "pk",
        "rid",
        F.rank().over(wt).alias("rnk"),
        F.dense_rank().over(wt).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )
    sql = """SELECT pk, rid,
      RANK() OVER (PARTITION BY pk ORDER BY ord) AS rnk,
      DENSE_RANK() OVER (PARTITION BY pk ORDER BY ord) AS drnk,
      ROW_NUMBER() OVER (PARTITION BY pk ORDER BY ord, rid) AS rn
      FROM wt"""
    check(out, con, sql, "ranking_ties")


def test_rows_frame_offsets_with_nulls(wtab):
    """ROWS BETWEEN k PRECEDING AND k FOLLOWING over NULL-holed values:
    count(val) skips NULLs, count(*) doesn't — both must match."""
    sdf, con = wtab
    w = Window.partitionBy("pk").orderBy("ord", "rid").rowsBetween(-1, 1)
    out = sdf.select(
        "pk",
        "rid",
        F.sum("val").over(w).alias("s"),
        F.count("val").over(w).alias("c_val"),
        F.count(F.lit(1)).over(w).alias("c_all"),
        F.min("val").over(w).alias("mn"),
        F.max("val").over(w).alias("mx"),
    )
    sql = """SELECT pk, rid,
      SUM(val) OVER w AS s, COUNT(val) OVER w AS c_val, COUNT(*) OVER w AS c_all,
      MIN(val) OVER w AS mn, MAX(val) OVER w AS mx
      FROM wt
      WINDOW w AS (PARTITION BY pk ORDER BY ord, rid ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"""
    check(out, con, sql, "rows_offsets")


def test_range_frame_with_ties(wtab):
    """RANGE frames include ALL tied rows regardless of physical position —
    the semantic difference from ROWS that the auxiliary-column trick in the
    reference exists for."""
    sdf, con = wtab
    w = Window.partitionBy("pk").orderBy("ord").rangeBetween(-10, 0)
    out = sdf.select("pk", "rid", F.count(F.lit(1)).over(w).alias("c"), F.sum("val").over(w).alias("s"))
    sql = """SELECT pk, rid, COUNT(*) OVER w AS c, SUM(val) OVER w AS s
      FROM wt WINDOW w AS (PARTITION BY pk ORDER BY ord RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)"""
    check(out, con, sql, "range_ties")


def test_lead_lag_first_last_nulls(wtab):
    sdf, con = wtab
    w = Window.partitionBy("pk").orderBy("ord", "rid")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = sdf.select(
        "pk",
        "rid",
        F.lead("val", 2).over(w).alias("ld2"),
        F.lag("val", 1, -1.0).over(w).alias("lg_default"),
        F.first("val").over(w).alias("fv"),
        F.last("val").over(wfull).alias("lv"),
    )
    sql = """SELECT pk, rid,
      LEAD(val, 2) OVER w AS ld2,
      LAG(val, 1, -1.0) OVER w AS lg_default,
      FIRST_VALUE(val) OVER w AS fv,
      LAST_VALUE(val) OVER (PARTITION BY pk ORDER BY ord, rid
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
      FROM wt WINDOW w AS (PARTITION BY pk ORDER BY ord, rid)"""
    check(out, con, sql, "lead_lag")


def test_first_last_ignore_nulls(wtab):
    """first_value/last_value IGNORE NULLS (reference IWindowFunction first/
    last_value respect-nulls default; Spark exposes both modes)."""
    sdf, con = wtab
    w = Window.partitionBy("pk").orderBy("ord", "rid")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = sdf.select(
        "pk",
        "rid",
        F.first("val", ignorenulls=True).over(w).alias("fv_in"),
        F.last("val", ignorenulls=True).over(wfull).alias("lv_in"),
        F.lead("val", 1, None).over(w).alias("ld"),
    )
    sql = """SELECT pk, rid,
      FIRST_VALUE(val IGNORE NULLS) OVER w AS fv_in,
      LAST_VALUE(val IGNORE NULLS) OVER (PARTITION BY pk ORDER BY ord, rid
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv_in,
      LEAD(val, 1) OVER w AS ld
      FROM wt WINDOW w AS (PARTITION BY pk ORDER BY ord, rid)"""
    check(out, con, sql, "ignore_nulls")

"""As-of join and binned range join (operators/temporal.py).

The reference lowers such queries to theta/cartesian joins
(DAGUtils.cpp join surface); here they are first-class scale-safe ops:
as-of is a single window pass (one shuffle, no blowup), range join is an
equi-join on time bins (no cross product). Plan shapes are pinned along
with the semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tiflash_spark.operators.temporal import asof_join, range_join_binned
from tiflash_spark.plans.explain import exchange_count, formatted_plan


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # right side: per-key reference values at known times
    return spark.createDataFrame(
        [
            Row(k=1, t=ts("2024-01-01 10:00:00"), px=100.0),
            Row(k=1, t=ts("2024-01-01 10:05:00"), px=105.0),
            Row(k=1, t=ts("2024-01-01 10:10:00"), px=110.0),
            Row(k=2, t=ts("2024-01-01 09:00:00"), px=900.0),
        ]
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            # before any quote → no match
            Row(trade_id=1, k=1, t=ts("2024-01-01 09:59:59"), qty=5),
            # exactly AT a quote ts → inclusive match (that quote)
            Row(trade_id=2, k=1, t=ts("2024-01-01 10:05:00"), qty=7),
            # between quotes → earlier quote
            Row(trade_id=3, k=1, t=ts("2024-01-01 10:07:30"), qty=9),
            # after all → last quote
            Row(trade_id=4, k=1, t=ts("2024-01-01 23:00:00"), qty=11),
            # different key
            Row(trade_id=5, k=2, t=ts("2024-01-01 09:30:00"), qty=13),
            # key with no quotes at all
            Row(trade_id=6, k=3, t=ts("2024-01-01 12:00:00"), qty=17),
        ]
    )


def test_asof_backward_semantics(spark, trades, quotes):
    out = asof_join(
        trades, quotes, by="k", left_ts="t", right_ts="t", right_cols=("px",)
    )
    got = {r.trade_id: (r.ref_px, r.ref_t) for r in out.collect()}
    assert got[1] == (None, None)
    assert got[2] == (105.0, ts("2024-01-01 10:05:00"))  # inclusive
    assert got[3] == (105.0, ts("2024-01-01 10:05:00"))
    assert got[4] == (110.0, ts("2024-01-01 10:10:00"))
    assert got[5] == (900.0, ts("2024-01-01 09:00:00"))
    assert got[6] == (None, None)
    # left schema passes through untouched
    assert {"trade_id", "k", "t", "qty", "ref_t", "ref_px"} == set(out.columns)


def test_asof_forward_semantics(spark, trades, quotes):
    out = asof_join(
        trades, quotes, by="k", left_ts="t", right_ts="t",
        right_cols=("px",), direction="forward",
    )
    got = {r.trade_id: r.ref_px for r in out.collect()}
    assert got[1] == 100.0  # next quote after 09:59:59
    assert got[2] == 105.0  # inclusive at equal ts
    assert got[3] == 110.0
    assert got[4] is None  # nothing after 23:00
    assert got[6] is None


def test_asof_matches_duckdb_asof_join(spark, trades, quotes):
    """Pin against DuckDB's native ASOF LEFT JOIN on the same rows."""
    import duckdb

    out = asof_join(
        trades, quotes, by="k", left_ts="t", right_ts="t", right_cols=("px",)
    )
    got = sorted((r.trade_id, r.ref_px) for r in out.collect())
    con = duckdb.connect()
    con.register("tr", trades.toPandas())
    con.register("q", quotes.toPandas())
    want = sorted(
        (int(a), b)
        for a, b in con.execute(
            "SELECT tr.trade_id, q.px FROM tr ASOF LEFT JOIN q "
            "ON tr.k = q.k AND tr.t >= q.t"
        ).fetchall()
    )
    assert got == want


def test_asof_single_shuffle_no_join(spark, trades, quotes):
    """The scale property: as-of is ONE exchange (the window) and contains
    no join operator at all — no range join, no cross product."""
    out = asof_join(
        trades, quotes, by="k", left_ts="t", right_ts="t", right_cols=("px",)
    )
    plan = formatted_plan(out)
    assert exchange_count(out) == 1
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_asof_internal_names_do_not_collide(spark):
    """Left frames owning _k/_ord/_r/_is_left style names still work —
    internals are derived via select aliases, not withColumn on left."""
    left = spark.createDataFrame(
        [Row(_k="user", _ord=9, t=ts("2024-01-01 10:01:00"), g=1)]
    )
    right = spark.createDataFrame(
        [Row(g=1, t=ts("2024-01-01 10:00:00"), v=42.0)]
    )
    out = asof_join(left, right, by="g", left_ts="t", right_ts="t", right_cols=("v",))
    r = out.collect()[0]
    assert r.ref_v == 42.0 and r._k == "user" and r._ord == 9


def test_range_join_binned_vs_naive(spark):
    """Binned equi-join == naive cross-filter on a case set covering:
    interval spanning multiple bins, point exactly at start (included),
    exactly at end (excluded), event in interval's last partial bin."""
    events = spark.createDataFrame(
        [Row(eid=i, t=ts(f"2024-01-01 10:{m:02d}:00"), v=float(i))
         for i, m in enumerate([0, 4, 10, 15, 21, 35, 59])]
    )
    iv = spark.createDataFrame(
        [
            Row(iid=1, s=ts("2024-01-01 10:00:00"), e=ts("2024-01-01 10:10:00")),
            Row(iid=2, s=ts("2024-01-01 10:04:00"), e=ts("2024-01-01 10:35:00")),
            Row(iid=3, s=ts("2024-01-01 11:30:00"), e=ts("2024-01-01 11:40:00")),
        ]
    )
    got = sorted(
        (r.iid, r.eid)
        for r in range_join_binned(
            events, iv, ts_col="t", start_col="s", end_col="e", bin_seconds=600
        ).collect()
    )
    naive = sorted(
        (r.iid, r.eid)
        for r in events.crossJoin(iv)
        .filter((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .collect()
    )
    assert got == naive
    assert (1, 0) in got and (1, 2) not in got  # start inclusive, end exclusive
    assert (3, 6) not in got  # empty interval region


def test_range_join_no_cross_product(spark):
    events = spark.createDataFrame(
        [Row(eid=1, t=ts("2024-01-01 10:00:00"), v=1.0)]
    )
    iv = spark.createDataFrame(
        [Row(iid=1, s=ts("2024-01-01 09:55:00"), e=ts("2024-01-01 10:05:00"))]
    )
    out = range_join_binned(events, iv, "t", "s", "e", bin_seconds=600)
    plan = formatted_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_tolerance_matches_pandas(spark):
    """tolerance_s semantics pinned against pandas merge_asof."""
    import pandas as pd

    from tiflash_spark.operators.temporal import asof_join

    left_rows = [
        (1, "2024-01-01 00:10:00"), (1, "2024-01-01 01:00:00"),
        (2, "2024-01-01 00:05:00"),
    ]
    right_rows = [
        (1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-01 00:50:00", 20.0),
        (2, "2024-01-01 00:04:00", 30.0),
    ]
    left = spark.createDataFrame(
        [(k, pd.Timestamp(t).to_pydatetime()) for k, t in left_rows],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, pd.Timestamp(t).to_pydatetime(), v) for k, t, v in right_rows],
        "k long, ts timestamp, v double",
    )
    got = {
        (r.k, r.ts): r.ref_v
        for r in asof_join(
            left, right, by="k", left_ts="ts", right_ts="ts",
            right_cols=("v",), tolerance_s=600,
        ).collect()
    }
    lp = pd.DataFrame(
        [(k, pd.Timestamp(t)) for k, t in left_rows], columns=["k", "ts"]
    ).sort_values("ts")
    rp = pd.DataFrame(
        [(k, pd.Timestamp(t), v) for k, t, v in right_rows],
        columns=["k", "ts", "v"],
    ).sort_values("ts")
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="k", tolerance=pd.Timedelta(seconds=600)
    )
    exp = {
        (r.k, r.ts.to_pydatetime()): (None if pd.isna(r.v) else r.v)
        for r in exp_df.itertuples()
    }
    assert got == exp, (got, exp)


# --- single-source as-of (one scan instead of two) ---------------------------


@pytest.fixture()
def tape(spark):
    """One table holding both legs, incl. a row matching BOTH predicates
    (kind='both'), version ties, and a left row with no match."""
    return spark.createDataFrame(
        [
            Row(ev=1, k=1, t=ts("2024-01-01 10:00:00"), v=1.0, kind="right"),
            Row(ev=2, k=1, t=ts("2024-01-01 10:05:00"), v=2.0, kind="left"),
            Row(ev=3, k=1, t=ts("2024-01-01 10:05:00"), v=3.0, kind="both"),
            Row(ev=4, k=1, t=ts("2024-01-01 10:09:00"), v=4.0, kind="left"),
            Row(ev=5, k=2, t=ts("2024-01-01 09:00:00"), v=5.0, kind="left"),
            Row(ev=6, k=3, t=ts("2024-01-01 09:00:00"), v=6.0, kind="right"),
        ]
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_single_source_equals_two_frame(spark, tape, direction):
    """asof_join_single_source ≡ asof_join(filter, filter) row-for-row —
    including a row that satisfies BOTH predicates (appears on both
    sides, exactly like the two separate filters)."""
    from tiflash_spark.operators.temporal import asof_join_single_source

    lp = F.col("kind").isin("left", "both")
    rp = F.col("kind").isin("right", "both")
    left_cols = ("ev", "k", "t", "v")
    two = asof_join(
        tape.filter(lp).select(*left_cols),
        tape.filter(rp),
        by="k", left_ts="t", right_ts="t", right_cols=("v",),
        direction=direction,
    )
    one = asof_join_single_source(
        tape, lp, rp, by="k", left_ts="t", right_ts="t",
        left_cols=left_cols, right_cols=("v",), direction=direction,
    )
    assert one.columns == two.columns
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_asof_single_source_tolerance(spark, tape):
    from tiflash_spark.operators.temporal import asof_join_single_source

    lp = F.col("kind").isin("left", "both")
    rp = F.col("kind").isin("right", "both")
    left_cols = ("ev", "k", "t", "v")
    two = asof_join(
        tape.filter(lp).select(*left_cols), tape.filter(rp),
        by="k", left_ts="t", right_ts="t", right_cols=("v",), tolerance_s=120,
    )
    one = asof_join_single_source(
        tape, lp, rp, by="k", left_ts="t", right_ts="t",
        left_cols=left_cols, right_cols=("v",), tolerance_s=120,
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_asof_single_source_plan_single_scan(spark, tmp_path):
    """The point of the variant: ONE scan of the source (the two-frame
    form scans it twice), still one exchange, still no join operator."""
    p = str(tmp_path / "tape")
    spark.createDataFrame(
        [
            Row(ev=i, k=i % 3, t=ts("2024-01-01 10:00:00"), v=float(i),
                kind="left" if i % 2 else "right")
            for i in range(20)
        ]
    ).write.parquet(p)
    src = spark.read.parquet(p)
    from tiflash_spark.operators.temporal import asof_join_single_source

    out = asof_join_single_source(
        src,
        F.col("kind") == "left",
        F.col("kind") == "right",
        by="k", left_ts="t", right_ts="t",
        left_cols=("ev", "k", "t", "v"), right_cols=("v",),
    )
    plan = formatted_plan(out)
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert exchange_count(out) == 1
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan

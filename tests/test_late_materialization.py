"""Late materialization: two-phase filter-column → payload read
(reference LateMaterializationBlockInputStream.h:25-31 — read the filter
column first, build the surviving-row bitmap, read the rest columns only
for survivors). Pins result parity with the single-scan paths, MVCC
soundness, and the plan shape (narrow phase-1 ReadSchema, pushed handle
predicates in phase 2)."""

from __future__ import annotations

import pytest

# long replay/property/parity sweep: excluded from the default run
# (pytest.ini addopts); scripts/full_suite.sh runs everything
pytestmark = pytest.mark.slow

import pytest

from pyspark.sql import Row

from tiflash_spark.operators.mvcc import HANDLE
from tiflash_spark.plans.explain import formatted_plan
from tiflash_spark.sources.delta_store import DeltaStore


def _rows(spark, items):
    return spark.createDataFrame(
        [Row(**{HANDLE: h, "k": k, "wide": f"payload-{h:05d}" * 8}) for h, k in items]
    )


@pytest.fixture()
def store(spark, tmp_path):
    s = DeltaStore(spark, str(tmp_path / "lm"))
    s.write_batch(_rows(spark, [(h, h % 100) for h in range(2000)]), version=1)
    s.compact_range_segments(ts=1, num_segments=4)
    s.build_zonemap(["k"])
    # delta tail: one update that leaves the match set, one that joins it,
    # one delete inside it
    s.write_batch(_rows(spark, [(7, 999)]), version=2)   # was k=7, leaves k<=10
    s.write_batch(_rows(spark, [(1500, 3)]), version=2)  # joins k<=10
    s.write_batch(_rows(spark, [(205, 5)]), version=2, delete=True)
    return s


def _by_handle(df):
    return {r[HANDLE]: (r.k, r.wide) for r in df.collect()}


def test_range_parity_with_read_where(store):
    want = _by_handle(store.read_where("k", 0, 10).select(HANDLE, "k", "wide"))
    got = _by_handle(store.read_late("k", 0, 10))
    assert got == want
    assert 7 not in got and 205 not in got and got[1500][0] == 3


def test_values_parity_with_read_where_in(store):
    want = _by_handle(store.read_where_in("k", [3, 5]).select(HANDLE, "k", "wide"))
    got = _by_handle(store.read_late("k", values=[3, 5]))
    assert got == want


def test_historical_snapshot(store):
    want = _by_handle(store.read_where("k", 0, 10, ts=1).select(HANDLE, "k", "wide"))
    got = _by_handle(store.read_late("k", 0, 10, ts=1))
    assert got == want
    assert got[7][0] == 7 and 205 in got  # pre-update, pre-delete snapshot


def test_semi_join_path_matches_inlist_path(store):
    want = _by_handle(store.read_late("k", 0, 10))
    store.LM_INLIST_LIMIT = 1  # force the many-survivor semi-join form
    got = _by_handle(store.read_late("k", 0, 10))
    assert got == want


def test_empty_and_projection(store):
    empty = store.read_late("k", 5000, 6000)
    assert empty.count() == 0
    assert empty.columns == [HANDLE, "k", "wide"]
    only_wide = store.read_late("k", 0, 0, payload_cols=["wide"])
    assert only_wide.columns == [HANDLE, "wide"]
    assert only_wide.count() == store.read_where("k", 0, 0).count()
    with pytest.raises(ValueError, match="payload columns"):
        store.read_late("k", 0, 0, payload_cols=["nope"])


def test_phase2_plan_pushes_handle_inlist(store):
    """Selective filter → the payload fetch is a handle IN-list pushed to
    the parquet scan: no join, row-group skip on the sorted stable."""
    df = store.read_late("k", values=[3], payload_cols=["wide"])
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "PushedFilters" in plan and "In(_tidb_rowid" in plan


def test_phase2_semi_join_plan_is_handle_bounded(store):
    store.LM_INLIST_LIMIT = 1
    df = store.read_late("k", 0, 40)  # ~41% survive: below the fallback
    plan = formatted_plan(df)
    # survivor leg: a scan whose ReadSchema has the filter col but NOT the
    # payload col — the wide bytes are only decoded on the payload leg
    schemas = [
        line.split("ReadSchema: ", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema: " in line
    ]
    assert any("k:" in s and "wide" not in s for s in schemas), plan
    assert any("wide" in s for s in schemas), plan
    # payload leg bounded by the survivor handle range → pushed to parquet
    assert "GreaterThanOrEqual(_tidb_rowid" in plan and "LessThanOrEqual(_tidb_rowid" in plan


def test_added_column_filter_reads_empty(store):
    store.add_column("new_flag", "int")
    assert store.read_late("new_flag", values=[1]).count() == 0


def test_read_late_on_common_handle_store(spark, tmp_path):
    """Late materialization on a clustered-index (string-handle) store:
    survivor min/max bounds are lexicographic, read_handles takes string
    handles — the whole two-phase path must be handle-type-agnostic."""
    from tiflash_spark.sources.common_handle import encode_common_handle_py

    s = DeltaStore(spark, str(tmp_path / "lm_ch"))
    rows = [
        Row(**{HANDLE: encode_common_handle_py(f"u{i % 5}", i),
               "k": i % 20, "wide": f"w{i}" * 10})
        for i in range(500)
    ]
    s.write_batch(spark.createDataFrame(rows), version=1)
    s.compact_range_segments(ts=1, num_segments=4)
    want = _by_handle(s.read_where("k", 2, 3).select(HANDLE, "k", "wide"))
    got = _by_handle(s.read_late("k", 2, 3))
    assert got == want and len(got) == 50
    s.LM_INLIST_LIMIT = 1  # force the bounded semi-join form on strings
    assert _by_handle(s.read_late("k", 2, 3)) == want


def test_conjunction_parity_and_pruning_union(store):
    """Multi-column conjunction: result equals the composed single-scan
    filters, and segment pruning takes the union of each conjunct's
    prunable segments."""
    want = _by_handle(
        store.read_where("k", 0, 10)
        .filter("wide LIKE 'payload-00%'")
        .select(HANDLE, "k", "wide")
    )
    got = _by_handle(
        store.read_late_conj(
            [("k", 0, 10), ("wide", None, "payload-00999zz")],
        )
    )
    # range on wide <= 'payload-00999zz' == LIKE 'payload-00%' for this data
    assert got == want and len(got) > 0
    # mixed range + IN conjunct
    got2 = _by_handle(store.read_late_conj([("k", 0, 10), ("k", [3, 5])]))
    want2 = _by_handle(store.read_where_in("k", [3, 5]).select(HANDLE, "k", "wide"))
    assert got2 == want2
    with pytest.raises(ValueError, match="at least one predicate"):
        store.read_late_conj([])
    with pytest.raises(ValueError, match="unbounded"):
        store.read_late_conj([("k", None, None)])


def test_low_selectivity_falls_back_to_single_scan(store):
    """Survivor fraction above LM_SELECTIVITY_FALLBACK → one full-width
    scan, no semi-join (the reference's LM enablement threshold)."""
    store.LM_INLIST_LIMIT = 1  # keep the IN-list path out of the way
    want = _by_handle(store.read_where("k", 0, 98).select(HANDLE, "k", "wide"))
    df = store.read_late("k", 0, 98)  # ~99% of rows survive
    assert _by_handle(df) == want
    plan = formatted_plan(df)
    assert "Join" not in plan  # single-scan fallback, not semi-join
    # a selective predicate on the same store still takes the LM path
    sel = store.read_late("k", 0, 3)
    assert "Join" in formatted_plan(sel)

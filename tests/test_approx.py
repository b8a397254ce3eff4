"""Sketch-aggregate bounds: HLL NDV within its rsd, quantiles within range."""

from __future__ import annotations

from tests.conftest import SF_MEDIUM
from tiflash_spark.operators.approx import approx_count_distinct, approx_quantiles


def test_hll_within_relative_error(spark):
    for r in approx_count_distinct(spark, SF_MEDIUM).collect():
        assert r.rel_err <= 0.05, (r.l_returnflag, r.approx_parts, r.exact_parts)


def test_quantiles_ordered_and_bounded(spark):
    for r in approx_quantiles(spark, SF_MEDIUM).collect():
        assert r.lo <= r.p50 <= r.p95 <= r.hi


def test_heavy_hitters_cms_bound(spark):
    """CMS guarantees: estimate never undercounts, and overcount stays
    within eps * N (eps=0.001, conf=0.99) for every probed token."""
    from tiflash_spark.operators.approx import approx_heavy_hitters

    rows = approx_heavy_hitters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    n_total = rows[0].n_total
    for r in rows:
        assert r.est >= r.exact, r
        assert r.est - r.exact <= 0.001 * n_total + 1, r

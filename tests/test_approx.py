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

"""Replay of the driver's correctness gate at sf0.001 — every registered
query with an oracle must hash-match DuckDB (mirrors CORRECTNESS_r{N})."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tiflash_spark.registry import all_oracles, all_queries
from tiflash_spark.testing import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, oracle_small, name):
    compare(QUERIES[name](spark, SF_SMALL), oracle_small, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Sketch/approximate queries: must run and return a stable schema."""
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
    assert df.columns


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0

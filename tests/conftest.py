"""Shared fixtures: one session-scoped SparkSession, duckdb oracle conns."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from tiflash_spark.session import get_spark

    s = get_spark("tests", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_small():
    from tiflash_spark.testing import duckdb_connection

    return duckdb_connection(SF_SMALL)

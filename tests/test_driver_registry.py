"""Driver-facing registry invariants: the gate records only the first 50
entries, so the merged registry must stay under the cap, cover every
fine-grained query exactly once, and produce digest rows that the DuckDB
rendering of the same expressions reproduces (spot-checked here; the full
sweep is scripts/parity_check.py)."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tiflash_spark.driver_registry import (
    DIGEST_GROUPS,
    DRIVER_LIMIT,
    ROWS_ONLY_GROUPS,
    driver_oracles,
    driver_queries,
)
from tiflash_spark.registry import all_oracles, all_queries
from tiflash_spark.testing import compare


def test_under_driver_cap_and_full_coverage():
    qs = driver_queries()  # raises on >50 or incomplete/duplicate coverage
    assert len(qs) <= DRIVER_LIMIT
    merged = [m for g in (*DIGEST_GROUPS.values(), *ROWS_ONLY_GROUPS.values()) for m, _ in g]
    assert set(merged) <= set(all_queries())
    # digest members with an oracle must come from oracle-backed fine queries
    fine_oracles = set(all_oracles())
    for members in DIGEST_GROUPS.values():
        for name, _ in members:
            assert name in fine_oracles, f"digest member {name} lacks a fine oracle"


def test_digest_group_parity_spot(spark, oracle_small):
    qs, osql = driver_queries(), driver_oracles()
    for group in ("join_flags_cross", "window_functions"):
        compare(qs[group](spark, SF_SMALL), oracle_small, osql[group], group)


def test_rows_only_groups_one_row_per_member(spark):
    qs = driver_queries()
    for gname, members in ROWS_ONLY_GROUPS.items():
        rows = qs[gname](spark, SF_SMALL).collect()
        assert len(rows) == len(members), gname
        assert {r.q for r in rows} == {m for m, _ in members}

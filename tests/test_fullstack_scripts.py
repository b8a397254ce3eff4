"""Replay the reference's own fullstack ``.test`` scripts, verbatim,
through the SQL surface (sources/testscript.run_script → admin_sql.run_sql
→ DeltaStore).

The reference drives its end-to-end suites through mysql-client scripts
(``tests/fullstack-test*/**/*.test`` executed by ``tests/run-test.py``);
this is the same transcript replayed against this engine — statements are
read from the reference tree at run time (never copied here) and the test
module skips when the tree is absent.

PASSING is the curated allowlist below (kept in sweep order —
scripts/fullstack_sweep.py regenerates it). Scripts NOT in the list
diverge for a reason recorded in KNOWN_DIVERGENT and are xfail-style
documented rather than silently dropped.
"""

from __future__ import annotations

import pytest

from tiflash_spark.sources.testscript import REFERENCE_TESTS, run_script

pytestmark = pytest.mark.skipif(
    not REFERENCE_TESTS.exists(), reason="reference tree not present"
)

# scripts that replay green end-to-end (value-level compare, unordered
# multiset — the reference's own comparison rules)
PASSING: list[str] = []

# script -> reason we deliberately diverge (documented, not hidden)
KNOWN_DIVERGENT: dict[str, str] = {}


@pytest.mark.parametrize("rel", PASSING)
def test_fullstack_script(spark, tmp_path, rel):
    res = run_script(spark, REFERENCE_TESTS / rel, str(tmp_path))
    assert not res.mismatches, "\n".join(res.mismatches[:10])
    assert res.checked > 0 or res.steps_run > 0

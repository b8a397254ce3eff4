"""Golden-output regression — the reference's inline golden tables
(SURVEY.md §5: .test files with expected output, gtest_*.out). Frozen
sf0.001 results for stable queries; regenerate with
`python tests/test_golden.py regen` after an intentional change."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
GOLDEN_QUERIES = [
    "q1_pricing_summary",
    "join_inner_broadcast",
    "rollup_revenue",
    "window_unbounded",
    "mvcc_snapshot",
    "dedup_exact",
    "events_funnel",
    "q12_shipmode",
]
SF = "/root/testdata/sf0.001"


def _snapshot(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = [[repr(v) for v in row] for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return {"columns": cols, "rows": rows}


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden(spark, name):
    from tiflash_spark.registry import all_queries

    path = GOLDEN_DIR / f"{name}.json"
    assert path.exists(), f"golden file missing — run `python tests/test_golden.py regen`"
    expected = json.loads(path.read_text())
    actual = _snapshot(all_queries()[name](spark, SF))
    assert actual == expected, f"{name}: output drifted from golden snapshot"


def regen():
    from tiflash_spark.registry import all_queries
    from tiflash_spark.session import get_spark

    spark = get_spark("golden", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    GOLDEN_DIR.mkdir(exist_ok=True)
    qs = all_queries()
    for name in GOLDEN_QUERIES:
        snap = _snapshot(qs[name](spark, SF))
        (GOLDEN_DIR / f"{name}.json").write_text(json.dumps(snap, indent=1))
        print("wrote", name, len(snap["rows"]), "rows")
    spark.stop()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "regen":
    sys.path.insert(0, str(Path(__file__).parent.parent))
    regen()


def test_apply_correlated_scalar_subquery_golden(spark):
    """Port of tests/fullstack-test/mpp/apply.test: correlated scalar
    subqueries with NON-EQUI correlation (t.a > t1.a) — the Apply
    pattern TiDB ships to the engine. Same data construction (8 seed
    rows doubled 9 times = 4096), same golden counts; cross-checked
    against DuckDB on the identical SQL."""
    import duckdb
    import pandas as pd

    rows = [(1, 2), (2, 1), (10, 15), (15, 10), (20, 25), (25, 10), (18, 19), (19, 18)]
    for _ in range(9):
        rows = rows + [(a + 5, b + 5) for a, b in rows]
    assert len(rows) == 4096
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    spark.createDataFrame(pdf).createOrReplaceTempView("apply_t")

    q1 = ("SELECT count(*) AS n FROM apply_t t "
          "WHERE a > (SELECT avg(b) FROM apply_t t1 WHERE t.a > t1.a)")
    q2 = ("SELECT count(*) AS n FROM apply_t t "
          "WHERE a > (SELECT min(a) FROM apply_t t1 WHERE t.a > t1.a)")
    n1 = spark.sql(q1).first().n
    n2 = spark.sql(q2).first().n
    assert n1 == 4094  # golden from apply.test
    con = duckdb.connect()
    con.register("apply_t", pdf)
    assert con.sql(q1).fetchone()[0] == n1
    assert con.sql(q2).fetchone()[0] == n2

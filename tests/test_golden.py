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


def test_window_test_goldens(spark):
    """Port of mpp/window.test: named-window row_number pairs, the
    repeated-rank sextuple, and the first_value/last_value batteries
    over the `first`/`first1`/`last1` tables (NULL values are ordinary
    values — first_value does NOT skip them). Cross-checked vs DuckDB
    on identical SQL."""
    import duckdb
    import pandas as pd

    t1 = pd.DataFrame(
        [(1, 1), (2, 2), (3, 3), (1, 1), (2, 2), (3, 3), (4, 4)],
        columns=["c1", "c2"],
    )
    first = pd.DataFrame(
        [(0, 0, "1"), (1, 1, "2"), (1, 2, "3"), (1, 3, "4"), (1, 4, "5"),
         (2, 5, "6"), (2, 6, "7"), (2, 7, "8"), (2, 8, "9"), (2, 9, "10"),
         (3, 10, "11"), (3, 11, "12"), (3, 12, "13")],
        columns=["p", "o", "v"],
    )
    first1 = first.copy()
    first1.loc[first1.o.isin([0, 1, 5, 10]), "v"] = None
    last1 = first.copy()
    last1.loc[last1.o.isin([0, 4, 9, 12]), "v"] = None

    con = duckdb.connect()
    for name, pdf in [("t1", t1), ("first", first), ("first1", first1),
                      ("last1", last1)]:
        spark.createDataFrame(pdf).createOrReplaceTempView(f"w_{name}")
        con.register(f"w_{name}", pdf)

    queries = [
        # named windows, two row_numbers in one SELECT
        ("SELECT c1, c2, row_number() OVER w2 AS r2, row_number() OVER w1 AS r1 "
         "FROM w_t1 WINDOW w1 AS (PARTITION BY c1 ORDER BY c2), "
         "w2 AS (PARTITION BY c1, c2 ORDER BY c2) ORDER BY 1, 2, 3, 4"),
        # first_value over the default frame
        ("SELECT p, o, v, first_value(v) OVER "
         "(PARTITION BY p ORDER BY o ASC) AS a FROM w_first ORDER BY p, o"),
        # bounded ROWS frames incl. the degenerate 0-preceding-0-following
        ("SELECT p, o, v, first_value(v) OVER (PARTITION BY p ORDER BY o ASC "
         "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS a FROM w_first "
         "ORDER BY p, o"),
        ("SELECT p, o, v, first_value(v) OVER (PARTITION BY p ORDER BY o ASC "
         "ROWS BETWEEN 0 PRECEDING AND 0 FOLLOWING) AS a FROM w_first "
         "ORDER BY p, o"),
        # NULLs are ordinary values for first_value/last_value
        ("SELECT p, o, v, first_value(v) OVER "
         "(PARTITION BY p ORDER BY o ASC) AS a FROM w_first1 ORDER BY p, o"),
        ("SELECT p, o, v, last_value(v) OVER (PARTITION BY p ORDER BY o ASC "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a "
         "FROM w_last1 ORDER BY p, o"),
    ]
    for q in queries:
        got = [tuple(r) for r in spark.sql(q).collect()]
        want = [tuple(r) for r in con.sql(q).fetchall()]
        assert got == want, q
    # the reference's golden for the first1 default-frame query: the
    # partition-leading NULL propagates until the frame grows past it
    r = {(x.p, x.o): x.a for x in spark.sql(queries[4]).collect()}
    assert r[(1, 1)] is None and r[(1, 4)] is None  # first row of p=1 is NULL
    assert r[(3, 12)] is None  # p=3 leads with NULL

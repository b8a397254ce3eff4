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


def test_window_agg_frames_golden(spark):
    """Frame-bounded window aggregates over mpp/window_agg.test's t1/t4
    data (t4 carries NULLs — SUM/AVG ignore them, COUNT(v) skips them,
    COUNT(*) doesn't). Cross-checked vs DuckDB on identical SQL."""
    import duckdb
    import pandas as pd

    t1 = pd.DataFrame(
        [(0, 0, -1), (1, 0, -1), (1, 1, 0), (1, 3, 4), (1, 6, 6), (1, 7, -5),
         (1, 8, 3), (1, 18, 1), (1, 30, 30), (2, 0, 2), (2, 1, 0), (2, 4, -4),
         (2, 7, -2), (2, 8, 1), (2, 15, 2), (2, 30, -11), (3, 0, 7),
         (3, 4, -3), (3, 6, 9), (3, 10, -9), (3, 20, -3), (3, 40, 2),
         (3, 41, 1), (4, 0, 4), (5, 0, -5), (6, 0, 2), (6, 10, 5),
         (6, 30, 0), (7, 0, 3), (7, 1, 3), (7, 2, 2), (7, 3, -4), (7, 4, 9)],
        columns=["p", "o", "v"],
    )
    t4 = t1.copy().astype({"v": "object"})
    null_os = {(1, 1), (1, 6), (1, 7), (1, 18), (1, 30), (2, 1), (2, 4),
               (2, 15), (2, 30), (3, 0), (3, 20), (5, 0), (6, 0), (6, 10),
               (6, 30), (7, 0), (7, 2), (7, 4)}
    t4["v"] = [None if (p, o) in null_os else v
               for p, o, v in t4.itertuples(index=False)]

    con = duckdb.connect()
    spark.createDataFrame(t1).createOrReplaceTempView("wa_t1")
    con.register("wa_t1", t1)
    spark.createDataFrame(t4.assign(v=pd.array(t4.v, dtype="Int64"))
                          ).createOrReplaceTempView("wa_t4")
    con.register("wa_t4", t4)

    queries = [
        ("SELECT p, o, SUM(v) OVER (PARTITION BY p ORDER BY o "
         "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS s FROM wa_t1 "
         "ORDER BY p, o"),
        ("SELECT p, o, CAST(COUNT(v) AS BIGINT) AS c, "
         "CAST(COUNT(*) AS BIGINT) AS call FROM ("
         "SELECT p, o, v FROM wa_t4) GROUP BY p, o ORDER BY p, o"),
        ("SELECT p, o, SUM(v) OVER (PARTITION BY p ORDER BY o "
         "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS s, "
         "CAST(COUNT(v) OVER (PARTITION BY p ORDER BY o "
         "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS c "
         "FROM wa_t4 ORDER BY p, o"),
        ("SELECT p, MIN(v) OVER (PARTITION BY p) AS mn, "
         "MAX(v) OVER (PARTITION BY p) AS mx FROM wa_t1 ORDER BY p, o"),
    ]
    for q in queries:
        got = [tuple(r) for r in spark.sql(q).collect()]
        want = [tuple(r) for r in con.sql(q).fetchall()]
        assert got == want, q


def test_having_any_quantified_rewrite(spark):
    """Port of mpp/having.test's `value <> ANY (subquery)`: Spark has no
    quantified comparison, and neither does the engine — TiDB rewrites
    it before shipping the plan; the same rewrite (EXISTS with the
    inequality) must reproduce the reference golden, cross-checked
    against DuckDB's native ANY."""
    import duckdb
    import pandas as pd

    t1 = pd.DataFrame([(0, "aaa"), (1, "bbb"), (2, "ccc")], columns=["id", "value"])
    t2 = pd.DataFrame([(0, "ddd"), (1, "eee"), (2, "ccc")], columns=["id", "value"])
    spark.createDataFrame(t1).createOrReplaceTempView("h_t1")
    spark.createDataFrame(t2).createOrReplaceTempView("h_t2")
    rewritten = ("SELECT * FROM h_t1 WHERE EXISTS "
                 "(SELECT 1 FROM h_t2 WHERE h_t1.value <> h_t2.value)")
    got = sorted((r.id, r.value) for r in spark.sql(rewritten).collect())
    con = duckdb.connect()
    con.register("h_t1", t1)
    con.register("h_t2", t2)
    want = sorted(con.sql(
        "SELECT * FROM h_t1 WHERE value <> ANY (SELECT value FROM h_t2)"
    ).fetchall())
    assert got == want == [(0, "aaa"), (1, "bbb"), (2, "ccc")]


def test_misc_join_decimal_cast_keys_with_residual(spark):
    """Port of mpp/misc_join.test: left join on CAST(decimal(5,2) AS
    decimal(7,2)) keys with an always-false residual arithmetic
    condition — every left row survives with NULL right side (the
    reference golden)."""
    import duckdb
    import pandas as pd
    from decimal import Decimal

    t1 = pd.DataFrame(
        {"id": [Decimal("1.00"), Decimal("2.00")], "value": [1, 2]}
    )
    t2 = pd.DataFrame(
        {"id": [Decimal(f"{i}.00") for i in (1, 2, 3, 4)], "value": [1, 2, 3, 4]}
    )
    spark.createDataFrame(t1, "id decimal(5,2), value bigint").createOrReplaceTempView("mj_t1")
    spark.createDataFrame(t2, "id decimal(5,2), value bigint").createOrReplaceTempView("mj_t2")
    q = ("SELECT t1.id AS id1, t1.value AS v1, t2.id AS id2, t2.value AS v2 "
         "FROM mj_t1 t1 LEFT JOIN mj_t2 t2 "
         "ON CAST(t1.id AS DECIMAL(7,2)) = CAST(t2.id AS DECIMAL(7,2)) "
         "AND t1.id + CAST(t2.id AS DECIMAL(7,2)) + t1.id > 10 "
         "ORDER BY id1")
    got = [(str(r.id1), r.v1, r.id2, r.v2) for r in spark.sql(q).collect()]
    assert got == [("1.00", 1, None, None), ("2.00", 2, None, None)]
    con = duckdb.connect()
    con.register("mj_t1", t1)
    con.register("mj_t2", t2)
    want = [(str(a), b, c, d) for a, b, c, d in con.sql(q).fetchall()]
    assert got == want


def test_count_not_return_null_and_cartesian(spark):
    """Ports of mpp/count_not_return_null.test (COUNT over an empty
    scan is 0 while SUM/AVG/MIN/MAX are NULL) and mpp/cartesian_join.test
    (cross join row count = |L| x |R|, condition-free)."""
    spark.createDataFrame([], "a int").createOrReplaceTempView("cnn_t")
    r = spark.sql(
        "SELECT COUNT(a) AS c, COUNT(*) AS cs, SUM(a) AS s, AVG(a) AS av,"
        " MIN(a) AS mn, MAX(a) AS mx FROM cnn_t"
    ).first()
    assert (r.c, r.cs) == (0, 0)
    assert r.s is None and r.av is None and r.mn is None and r.mx is None

    spark.range(7).createOrReplaceTempView("cj_l")
    spark.range(13).createOrReplaceTempView("cj_r")
    n = spark.sql("SELECT COUNT(*) AS n FROM cj_l CROSS JOIN cj_r").first().n
    assert n == 7 * 13

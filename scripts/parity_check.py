"""Run the driver's oracle-parity comparison locally with per-query timing.

Usage: python scripts/parity_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as e  # noqa: E402
from tiflash_spark.session import get_spark  # noqa: E402
from tiflash_spark.testing import compare, duckdb_connection  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    t0 = time.time()
    spark = get_spark("parity", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"[{time.time() - t0:6.1f}s] session up", flush=True)

    con = duckdb_connection(sf)
    # sweep BOTH registries: the fine-grained per-operator queries
    # (row-level fidelity) and the driver-facing ≤50 set (what the gate
    # records, incl. digest merges) — a digest bug or a fine-query bug
    # each fails its own row here.
    qs = dict(e.extended_queries())
    osql = dict(e.extended_oracle_sql())
    for name, fn in e.queries().items():
        if name not in qs:
            qs[f"driver:{name}"] = fn
    for name, sql in e.oracle_sql().items():
        if name not in osql:
            osql[f"driver:{name}"] = sql
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only and name.removeprefix("driver:") not in only:
            continue
        t1 = time.time()
        try:
            if name in osql:
                compare(fn(spark, sf), con, osql[name], name)
                status = "OK      "
            else:
                rows = fn(spark, sf).count()
                status = f"ROWS={rows}"
            n_ok += 1
            print(f"[{time.time() - t1:6.1f}s] {status} {name}", flush=True)
        except Exception as ex:
            n_fail += 1
            print(f"[{time.time() - t1:6.1f}s] FAIL     {name}: {str(ex)[:400]}", flush=True)
    print(f"done: {n_ok} ok, {n_fail} fail, total {time.time() - t0:.1f}s", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

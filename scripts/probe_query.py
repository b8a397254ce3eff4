"""Isolate one query's cost: DataFrame BUILD time (driver-side py4j +
analysis) vs EXECUTION time (noop sink, guide §1.4), plus the formatted
plan. Usage:

    python scripts/probe_query.py <query> [sf_dir] [n_runs]

Prints per-run build/exec seconds and writes the plan to
/tmp/probe_<query>.plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from tiflash_spark.registry import all_queries
    from tiflash_spark.session import get_spark

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    fn = qs[name]

    # session warm-up mirroring bench.py
    spark.range(1_000_000).selectExpr("count(*)").collect()
    fn(spark, sf_dir).collect()

    spark.sparkContext.setJobDescription(f"probe: {name}")
    for i in range(n):
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(f"run {i}: build {t1 - t0:6.3f}s  exec(noop) {t2 - t1:6.3f}s", flush=True)
    # one collect-run for the bench-comparable number
    t0 = time.time()
    fn(spark, sf_dir).collect()
    print(f"collect run: {time.time() - t0:6.3f}s", flush=True)
    with open(f"/tmp/probe_{name}.plan", "w") as fh:
        fh.write(fn(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
    print(f"plan -> /tmp/probe_{name}.plan", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

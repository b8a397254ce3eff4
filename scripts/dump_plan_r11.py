"""Dump .explain('formatted') for named queries into plans/r11/.

Usage: python scripts/dump_plan_r11.py before q2_min_cost_supplier lm_perplexity ...
       python scripts/dump_plan_r11.py after  q2_min_cost_supplier

Writes plans/r11/<query>_<tag>.txt — the optimization round's
before/after evidence files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from tiflash_spark.registry import all_queries  # noqa: E402
from tiflash_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump_plan_r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs("plans/r11", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r11/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

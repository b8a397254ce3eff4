"""Sweep every delta-merge-test script through sources/dbgscript and report
per-script pass/fail — regenerates the PASSING list for
tests/test_deltamerge_scripts.py.

Usage: python scripts/deltamerge_sweep.py [filter-substring]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tiflash_spark.session import get_spark  # noqa: E402
from tiflash_spark.sources.dbgscript import (  # noqa: E402
    DELTA_MERGE_TESTS,
    run_script,
)


def main() -> None:
    flt = sys.argv[1] if len(sys.argv) > 1 else ""
    spark = get_spark("dbg-sweep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    scripts = sorted(DELTA_MERGE_TESTS.rglob("*.test"))
    ok, bad = [], []
    for p in scripts:
        rel = str(p.relative_to(DELTA_MERGE_TESTS))
        if flt and flt not in rel:
            continue
        t0 = time.time()
        try:
            r = run_script(spark, p, "/tmp/dbg_sweep")
            mism = r.mismatches
        except Exception as e:  # noqa: BLE001
            mism = [f"RUNNER {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if not mism:
            ok.append(rel)
            print(f"PASS {rel} ({dt:.1f}s)")
        else:
            bad.append(rel)
            print(f"FAIL {rel} ({dt:.1f}s)")
            for m in mism[:3]:
                print(f"   {m}")
        sys.stdout.flush()
    print(f"\n== {len(ok)} pass / {len(bad)} fail ==")
    for rel in bad:
        print("FAIL:", rel)
    print("\nPASSING = [")
    for rel in ok:
        print(f'    "{rel}",')
    print("]")


if __name__ == "__main__":
    main()

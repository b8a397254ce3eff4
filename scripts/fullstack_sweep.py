"""Sweep the reference's fullstack .test scripts through the replay
harness (sources/testscript.py) and report per-script pass/fail.

Usage: python scripts/fullstack_sweep.py [subdir ...]
  default subdirs: fullstack-test/expr fullstack-test/mpp
                   fullstack-test2/dml fullstack-test2/ddl

Prints one line per script: OK / MISMATCH(n) / ERROR, then a summary.
Used to curate the allowlist in tests/test_fullstack_scripts.py.
"""

from __future__ import annotations

import sys
import tempfile
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tiflash_spark.sources.testscript import REFERENCE_TESTS, run_script  # noqa: E402


def main() -> None:
    subdirs = sys.argv[1:] or [
        "fullstack-test/expr",
        "fullstack-test/mpp",
        "fullstack-test2/dml",
        "fullstack-test2/ddl",
    ]
    from tiflash_spark.session import get_spark

    spark = get_spark("fullstack-sweep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    ok, bad, err = [], [], []
    for sub in subdirs:
        root = REFERENCE_TESTS / sub
        if not root.exists():
            print(f"-- missing {root}", flush=True)
            continue
        import os as _os

        only = _os.environ.get("SWEEP_ONLY")
        for path in sorted(root.glob("*.test")):
            rel = f"{sub}/{path.name}"
            if only and not __import__("re").search(only, rel):
                continue
            with tempfile.TemporaryDirectory() as tmp:
                try:
                    res = run_script(spark, path, tmp)
                except Exception as e:  # noqa: BLE001
                    err.append(rel)
                    print(f"ERROR     {rel}: {type(e).__name__}: {e}", flush=True)
                    traceback.print_exc(limit=3)
                    continue
            if res.mismatches:
                bad.append(rel)
                print(f"MISMATCH  {rel} ({len(res.mismatches)}; checked {res.checked})", flush=True)
                for m in res.mismatches[:3]:
                    print(f"          | {m[:300]}", flush=True)
            else:
                ok.append(rel)
                print(f"OK        {rel} (checked {res.checked}, unchecked {res.unchecked})", flush=True)
    print(f"\n== {len(ok)} ok / {len(bad)} mismatch / {len(err)} error ==")
    print("OK list:")
    for r in ok:
        print(f'    "{r}",')


if __name__ == "__main__":
    main()

"""Run EVERY registered query at a given scale factor — the robustness
sweep behind "all 63 queries run clean at sf0.1" (the driver's
correctness gate runs sf0.01; bench covers 30 entries at sf0.1; this
covers the rest at any SF).

Usage: python sweep_all_queries.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import sys
import time

from animaltrackingetls_spark.session import get_spark

import __spark_entry__ as entry


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        master="local[32]", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    fails = []
    for name, fn in entry.queries().items():
        t0 = time.monotonic()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK   {name}: {n} rows in {time.monotonic() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — a sweep reports, never dies
            fails.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}", flush=True)
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

"""Capture `.explain("formatted")` for headline queries → plans/r16/.

Usage: python capture_plans_r16.py [suffix] [query ...]
suffix defaults to "before"; queries default to bench.HEADLINE.
"""

from __future__ import annotations

import os
import sys

from animaltrackingetls_spark.plans.audit import formatted_plan
from animaltrackingetls_spark.session import get_spark

import __spark_entry__ as entry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r16")


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1:] or bench.HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as err:
            plan = f"PLAN ERROR: {err}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()

"""Round-15 per-query profiler (guide §1: measure first).

For each headline query: warm it, then time N runs with the SAME
`.count()` action the bench uses, AND record how many Spark jobs /
stages / tasks one invocation launches (statusTracker over a per-query
job group) — at sf0.1 the data is 17 MB, so job/stage/task COUNT (fixed
scheduling + boundary overhead), not byte volume, is where the seconds
live; a query whose warm median is 2 s over 40 tasks is overhead-bound
and needs structural surgery (fewer jobs, fewer exchanges, fewer
Python round trips), not byte-level tuning.

Usage: python profile_r15.py [query ...]   (default: bench HEADLINE)
Writes /tmp/profile_r15.json and prints one line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from animaltrackingetls_spark.session import get_spark

import __spark_entry__ as entry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))


def profile_query(spark, qs, name: str) -> dict:
    sc = spark.sparkContext
    fn = qs[name]
    # warm run (cold costs: cached-table builds, codegen, index builds)
    fn(spark, SF_DIR).count()
    group = f"profile_{name}"
    sc.setJobGroup(group, name)
    t0 = time.monotonic()
    n_rows = fn(spark, SF_DIR).count()
    wall_one = time.monotonic() - t0
    sc.setJobGroup(None, None)
    st = sc.statusTracker()
    job_ids = st.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in job_ids:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = st.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    walls = []
    for _ in range(RUNS):
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        walls.append(round(time.monotonic() - t0, 3))
    return {
        "rows": n_rows,
        "jobs": len(job_ids),
        "stages": n_stages,
        "tasks": n_tasks,
        "wall_instrumented": round(wall_one, 3),
        "walls": walls,
        "wall_min": min(walls),
    }


def main() -> None:
    names = sys.argv[1:] or bench.HEADLINE
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    entry._t(spark, SF_DIR, "lineitem").count()
    entry._t(spark, SF_DIR, "events").count()
    out = {}
    for name in names:
        try:
            out[name] = profile_query(spark, qs, name)
        except Exception as err:  # keep profiling the rest
            out[name] = {"error": str(err).splitlines()[0][:200]}
            print(f"{name}: ERROR {out[name]['error']}", flush=True)
            continue
        r = out[name]
        print(
            f"{name}: min {r['wall_min']:.3f}s walls={r['walls']} "
            f"jobs={r['jobs']} stages={r['stages']} tasks={r['tasks']}",
            flush=True,
        )
    with open("/tmp/profile_r15.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"total_min": round(sum(
        v.get("wall_min", 0) for v in out.values()), 3)}))


if __name__ == "__main__":
    main()

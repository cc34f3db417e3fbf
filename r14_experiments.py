"""Round-14 experiments.

* ``movers`` — the isolated 6-run-floor protocol on the TWO
  unadjudicated round-13 driver-bench movers (r13 verdict "what's
  wrong" #1): tpch_panel (+40% spread-min, bench position #2 inside
  the driver run's contention window) and ivfpq_topk (+54%,
  sub-second, late position). Neither query's code changed in round
  13 (the r13 diff to __spark_entry__.py touched only _q_versioned_cdf
  and its oracle) and the driver bench self-reported contention
  (loadavg 4.13, its own canary 2.3x slower at start than end), so the
  protocol separates code from machine state by construction: fresh
  process per (tree, query), trees = the r13 tree (8d9a51f, what the
  driver benched) vs the r12 tree (e2fe455), 7 runs each (floor = min
  of the last 6), numpy-GEMM calibration in the same process.
* ``dvtax`` — the deletion-vector read tax at 10M rows, before/after
  the round-14 file-scoped anti-join (r13 verdict #2 measured the
  table-wide form at 0.39s -> 3.61s for a 100-key DV) and after a
  REORG purge (r13 verdict #3: self-healing).
* ``morvolume`` — merge-on-read UPDATE vs copy-on-write at 10M: bytes
  written and wall for a 100-key update batch (r13 verdict #4).
* ``ivmpoll`` — the IVM poll's fixed cost at 10M with the round-14
  single-commit apply (r13 verdict #8 measured the two-commit form at
  7.21s interior-churn vs 0.98s full recompute).

Run on a settled machine; each prints its SCALING.md-ready lines.
"""

from __future__ import annotations

import json
import subprocess
import sys

_FLOOR_SNIPPET = r'''
import json, time
import numpy as np
import sys
sys.path.insert(0, ".")
from animaltrackingetls_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark(master="local[32]",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
SF = "/root/testdata/sf0.1"
entry._t(spark, SF, "documents").count()
entry._t(spark, SF, "lineitem").count()
q = entry.queries()[__import__("os").environ.get("BISECT_QUERY")]
times = []
for _ in range(7):
    t0 = time.monotonic(); q(spark, SF).count()
    times.append(time.monotonic() - t0)
gemm = []
A = np.random.default_rng(7).random((1024, 1024)); B = A.T.copy()
for _ in range(5):
    g0 = time.monotonic(); A @ B; gemm.append(time.monotonic() - g0)
print("FLOOR_JSON " + json.dumps({
    "floor": round(min(times[1:]), 3),
    "runs": [round(t, 3) for t in times],
    "gemm": round(min(gemm[2:]), 4),
}))
'''

MOVER_QUERIES = ["tpch_panel", "ivfpq_topk"]


def _trees():
    import os

    trees = []
    for label, ref in (("r13-8d9a51f", "8d9a51f"),
                       ("r12-e2fe455", "e2fe455")):
        wt = f"/tmp/r14_bisect_{ref}"
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, ref],
                cwd="/root/repo", check=True, capture_output=True,
            )
        trees.append((label, wt))
    return trees


def movers() -> None:
    import os

    trees = _trees()
    for qname in MOVER_QUERIES:
        results = {}
        for label, cwd in trees:
            env = dict(os.environ, BISECT_QUERY=qname)
            out = subprocess.run(
                [sys.executable, "-c", _FLOOR_SNIPPET], cwd=cwd,
                env=env, capture_output=True, text=True, timeout=900,
            )
            line = [l for l in out.stdout.splitlines()  # noqa: E741
                    if l.startswith("FLOOR_JSON ")]
            if not line:
                print(f"{qname} [{label}]: FAILED\n"
                      f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
                continue
            results[label] = json.loads(line[0][len("FLOOR_JSON "):])
            r = results[label]
            print(f"{qname} isolated floor [{label}]: "
                  f"{r['floor']:.3f}s (runs {r['runs']}, "
                  f"gemm {r['gemm']:.4f}s)", flush=True)
        if len(results) == 2:
            new, old = results["r13-8d9a51f"], results["r12-e2fe455"]
            ratio = new["floor"] / old["floor"] if old["floor"] else 0
            print(f"  -> r13/r12 floor ratio {ratio:.2f} "
                  "(within ~1.10 at matching gemm = machine state, "
                  "not code)", flush=True)


def _ten_m(spark, tmp, files=32):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        upsert_parquet_versioned,
    )

    t = f"{tmp}/t10m"
    df = spark.range(0, 10_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 9973).alias("g"),
        (F.col("id") % 100000).cast("double").alias("x"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=10,
                             target_files=files)
    return t


def _du(d) -> int:
    import os

    total = 0
    seen = set()
    for root, _dirs, fns in os.walk(d):
        for fn in fns:
            p = os.path.join(root, fn)
            st = os.stat(p)
            if st.st_ino in seen:
                continue  # hardlinked carry: count bytes once
            seen.add(st.st_ino)
            total += st.st_size
    return total


def dvtax() -> None:
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        delete_versioned,
        read_versioned,
        reorg_purge_versioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r14dvtax")
    t = _ten_m(spark, tmp)

    def timed(tag):
        times = []
        for _ in range(4):
            t0 = time.monotonic()
            n = read_versioned(spark, t).count()
            times.append(time.monotonic() - t0)
        print(f"  {tag}: count={n} floor={min(times[1:]):.3f}s "
              f"(runs {[round(x,3) for x in times]})", flush=True)
        return min(times[1:])

    plain = timed("full count, no DV")
    delete_versioned(
        spark, t,
        spark.createDataFrame([(k,) for k in range(0, 1000, 10)],
                              "k long"),
        ["k"], keep_versions=10, dv=True)
    dv = timed("full count, 100-row DV (file-scoped anti-join)")
    r = reorg_purge_versioned(spark, t, keep_versions=10)
    print(f"  purge report: {r}", flush=True)
    healed = timed("full count after REORG purge")
    print(f"DVTAX 10M: plain {plain:.3f}s -> dv {dv:.3f}s "
          f"(r13 table-wide form: 0.39 -> 3.61) -> purged {healed:.3f}s",
          flush=True)


def morvolume() -> None:
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        list_versions,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r14mor")
    batch_rows = [(k, 0, 1.5, "u") for k in range(0, 3_200_000, 32_000)]

    for mode in ("cow", "dv"):
        t = _ten_m(spark, f"{tmp}/{mode}")
        batch = spark.createDataFrame(
            batch_rows, "k long, g long, x double, pad string")
        before = _du(t)
        t0 = time.monotonic()
        upsert_parquet_versioned(
            spark, t, batch, ["k"], keep_versions=10,
            cow=(mode == "cow"), dv=(mode == "dv"))
        wall = time.monotonic() - t0
        grew = _du(t) - before
        v = list_versions(t)[-1]
        print(f"MOR 10M [{mode}]: 100-key update wall {wall:.2f}s, "
              f"new bytes {grew/1e6:.1f} MB, version {v}", flush=True)


def ivmpoll() -> None:
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.cdc import resolve_cdc
    from animaltrackingetls_spark.inventory import (
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r14ivm")
    src = f"{tmp}/src"
    resolve_cdc(src, True)
    df = spark.range(0, 10_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 9973).alias("g"),
        (F.col("id") % 100000).cast("double").alias("x"),
    )
    upsert_parquet_versioned(
        spark, src, df, ["k"], keep_versions=10, target_files=32,
        cow=True)
    view, cur = f"{tmp}/view", f"{tmp}/cur"

    def poll(tag):
        t0 = time.monotonic()
        r = maintain_aggregate_once(
            spark, src, view, cur, ["g"], sum_cols=["x"],
            minmax_cols=["x"], dest_keep_versions=3)
        print(f"  poll[{tag}]: {time.monotonic() - t0:.2f}s {r}",
              flush=True)

    poll("bootstrap")
    # interior churn: 1000 keys updated, extrema untouched (values
    # stay interior), no rescan expected
    batch = spark.createDataFrame(
        [(k, k % 9973, 50_000.5) for k in range(7, 3_200_000, 3_200)],
        "k long, g long, x double")
    upsert_parquet_versioned(spark, src, batch, ["k"],
                             keep_versions=10, cow=True)
    poll("interior-churn (single-commit apply; r13 two-commit: 7.21s)")
    # full recompute baseline for the same window shape
    from animaltrackingetls_spark.inventory import read_versioned

    t0 = time.monotonic()

    full = read_versioned(spark, src).groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("x").alias("n_x"),
        F.sum("x").alias("sum_x"), F.min("x").alias("min_x"),
        F.max("x").alias("max_x"))
    full.write.mode("overwrite").parquet(f"{tmp}/fullagg")
    print(f"  full-recompute+write baseline: "
          f"{time.monotonic() - t0:.2f}s", flush=True)


def sketch10m() -> None:
    """HLL sketch-column maintenance at 10M rows: bootstrap, an
    insert-only window (pure hll_union tighten, no rescan), and a
    delete-bearing window (every touched group rescans)."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.cdc import resolve_cdc
    from animaltrackingetls_spark.inventory import (
        delete_versioned,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r14sk")
    src = f"{tmp}/src"
    resolve_cdc(src, True)
    df = spark.range(0, 10_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 9973).alias("g"),
        (F.col("id") % 100_000).cast("double").alias("x"),
    )
    upsert_parquet_versioned(spark, src, df, ["k"], keep_versions=10,
                             target_files=32, cow=True)
    view, cur = f"{tmp}/view", f"{tmp}/cur"

    def poll(tag):
        t0 = time.monotonic()
        r = maintain_aggregate_once(
            spark, src, view, cur, ["g"], sum_cols=["x"],
            sketch_cols=["x"], dest_keep_versions=3)
        print(f"  poll[{tag}]: {time.monotonic() - t0:.2f}s "
              f"touched={r['groups_touched']} src={r['source']}",
              flush=True)

    poll("bootstrap (full 10M sketch agg)")
    ins = spark.createDataFrame(
        [(10_000_000 + i, i % 9973, 7.5) for i in range(1000)],
        "k long, g long, x double")
    upsert_parquet_versioned(spark, src, ins, ["k"], keep_versions=10,
                             cow=True)
    poll("insert-only window (hll_union tighten, no rescan)")
    delete_versioned(
        spark, src,
        spark.createDataFrame([(k,) for k in range(7, 3_200_000, 32_000)],
                              "k long"),
        ["k"], keep_versions=10, cow=True)
    poll("delete window (100 keys -> ~100 groups rescanned)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "movers"
    {"movers": movers, "dvtax": dvtax, "morvolume": morvolume,
     "ivmpoll": ivmpoll, "sketch10m": sketch10m}[cmd]()

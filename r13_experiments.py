"""Round-13 experiments.

* ``movers`` — the isolated 6-run-floor protocol on the FOUR
  unadjudicated round-12 driver-bench movers (r12 verdict "what's
  wrong" #1): pii_redaction (+34%), contamination_overlap (+37%),
  bloom_new_docs (+32%), portable_fingerprints (+16%). None of their
  source files changed in round 12 (the r12 diff touches
  cdc/inventory/versioning/streaming/filestats/validate only) and the
  driver bench self-reported contention (loadavg 3.77, canary floor
  halving across the run), so the protocol separates code from machine
  state by construction: fresh process per (tree, query), trees =
  current vs the r11 tree (8566e97), 7 runs each (floor = min of the
  last 6), numpy-GEMM calibration in the same process.
* ``ivmrescan`` — min/max view maintenance at 10M rows: the
  affected-group rescan's cost vs poll churn (SCALING.md row for r12
  verdict task #3).

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

MOVER_QUERIES = [
    "pii_redaction",
    "contamination_overlap",
    "bloom_new_docs",
    "portable_fingerprints",
]


def _trees():
    import os

    trees = [("current", "/root/repo")]
    for label, ref in (("r11-8566e97", "8566e97"),):
        wt = f"/tmp/r13_bisect_{ref}"
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
            line = [l for l in out.stdout.splitlines()
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
            cur, old = results["current"], results["r11-8566e97"]
            ratio = cur["floor"] / old["floor"] if old["floor"] else 0
            print(f"  -> current/r11 floor ratio {ratio:.2f} "
                  "(within ~1.10 at matching gemm = machine state, "
                  "not code)", flush=True)


def ivmrescan() -> None:
    """min/max IVM at 10M: poll cost for (a) interior churn (no
    rescan), (b) extremum-touching deletes (affected-group rescan),
    vs (c) the full recompute."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.operators import versioning as V
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r13ivm_")
    src = os.path.join(tmp, "src")
    view = os.path.join(tmp, "view")
    cur = os.path.join(tmp, "cursor")
    N, G = 10_000_000, 9973
    df = spark.range(0, N).select(
        F.col("id").alias("k"),
        (F.col("id") % G).alias("g"),
        # x strictly increasing within group: the max of group g is the
        # LAST k in the group, min the first — easy to target deletes
        F.col("id").cast("double").alias("x"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    inv.upsert_parquet_versioned(spark, src, df, ["k"], keep_versions=6,
                                 write_change_data=True, cow=True)

    def poll():
        t0 = time.monotonic()
        r = V.maintain_aggregate_once(
            spark, src, view, cur, ["g"], sum_cols=["x"],
            minmax_cols=["x"], dest_keep_versions=3,
        )
        return time.monotonic() - t0, r

    wall, r = poll()
    print(f"bootstrap 10M -> {G}-group view: {wall:.2f}s "
          f"({r['groups_touched']} groups)")

    # (a) interior churn: update 1k keys in the middle of their groups
    mid = spark.range(0, 1000).select(
        (F.col("id") * G + G // 2).alias("k"),
        ((F.col("id") * G + G // 2) % G).alias("g"),
        (F.col("id") * G + G // 2 + 0.5).cast("double").alias("x"),
        F.lit("u").alias("payload"),
    )
    inv.upsert_parquet_versioned(spark, src, mid, ["k"], keep_versions=6,
                                 cow=True)
    wall, r = poll()
    print(f"interior-churn poll (1k updates, no extremum touch): "
          f"{wall:.2f}s touched={r['groups_touched']}")

    # (b) extremum deletes: remove the LAST row of 200 groups (their
    # max) -> affected-group rescan of exactly those 200 groups
    doomed = spark.range(0, 200).select(
        (F.lit(N - G) + F.col("id")).alias("k"))
    inv.delete_versioned(spark, src, doomed, ["k"], keep_versions=6,
                         cow=True)
    wall, r = poll()
    print(f"extremum-delete poll (200 groups rescanned): {wall:.2f}s "
          f"touched={r['groups_touched']}")

    # (c) the full recompute for comparison
    t0 = time.monotonic()
    inv.read_versioned(spark, src).groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.count("x").alias("n_x"),
        F.sum("x").alias("sum_x"), F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    ).write.mode("overwrite").parquet(os.path.join(tmp, "full"))
    print(f"full 10M recompute baseline: {time.monotonic() - t0:.2f}s")
    shutil.rmtree(tmp, ignore_errors=True)


def streamdrain() -> None:
    """5M-row change-feed drain: rows transport (Python-Arrow data
    phase) vs paths transport (JVM scans inside foreachBatch) vs the
    raw JVM twin (spark.read.parquet of the same change files) —
    r12 verdict task #5's done criterion is paths within ~2× of the
    twin."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import cdc
    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r13drain_")
    src = os.path.join(tmp, "src")
    N = 5_000_000
    df = spark.range(0, N).select(
        F.col("id").alias("k"),
        (F.col("id") % 9973).alias("g"),
        F.col("id").cast("double").alias("x"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    inv.upsert_parquet_versioned(spark, src, df, ["k"], keep_versions=4,
                                 write_change_data=True, cow=True)

    files = cdc.change_log(src, inv.list_versions(src)[-1])
    t0 = time.monotonic()
    n_jvm = spark.read.parquet(*files).count()
    jvm = time.monotonic() - t0
    print(f"JVM twin ({n_jvm} rows, {len(files)} files): {jvm:.2f}s")

    for transport in ("rows", "paths"):
        out = os.path.join(tmp, f"out_{transport}")
        ck = os.path.join(tmp, f"ck_{transport}")
        counted = {}

        def sink(bdf, bid, transport=transport):
            rows = (
                cdc.expand_change_paths(bdf.sparkSession, bdf, src)
                if transport == "paths" else bdf
            )
            counted["n"] = counted.get("n", 0) + rows.count()

        t0 = time.monotonic()
        q = (
            cdc.read_changes_stream(spark, src, starting="earliest",
                                    transport=transport)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(600)
        wall = time.monotonic() - t0
        print(f"{transport} transport drain ({counted['n']} rows): "
              f"{wall:.2f}s  ({wall / jvm:.1f}x JVM twin)")
    shutil.rmtree(tmp, ignore_errors=True)


def dvdelete() -> None:
    """Deletion-vector delete vs copy-on-write delete at 10M rows,
    100-key churn: commit wall, bytes written by the commit, and the
    read-side tax the DV's anti-join adds."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r13dv_")

    def du(version_dir):
        total = 0
        for root, _d, files in os.walk(version_dir):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                if st.st_nlink > 1:
                    continue  # hardlink-carried: not new bytes
                total += st.st_size
        return total

    def build(name):
        t = os.path.join(tmp, name)
        df = spark.range(0, 10_000_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("g"),
            F.col("id").cast("double").alias("x"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        inv.upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=4,
                                     cow=True)
        inv.optimize_versioned(spark, t, ["k"], keep_versions=4)
        return t

    doomed = [(k,) for k in range(0, 10_000_000, 100_000)]  # 100 keys
    for mode, kw in (("cow", {"cow": True}), ("dv", {"dv": True})):
        t = build(mode)
        kdf = spark.createDataFrame(doomed, "k long")
        t0 = time.monotonic()
        inv.delete_versioned(spark, t, kdf, ["k"], keep_versions=4, **kw)
        wall = time.monotonic() - t0
        v = inv.list_versions(t)[-1]
        new_bytes = du(os.path.join(t, v))
        t0 = time.monotonic()
        n = inv.read_versioned(spark, t).count()
        read_wall = time.monotonic() - t0
        t0 = time.monotonic()
        inv.read_versioned(spark, t).filter("g = 123").count()
        sel_wall = time.monotonic() - t0
        print(f"{mode} delete (100 keys / 10M): commit {wall:.2f}s, "
              f"new bytes {new_bytes/1e6:.1f} MB; full count ({n}) "
              f"{read_wall:.2f}s, selective read {sel_wall:.2f}s")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "movers":
        movers()
    elif cmd == "ivmrescan":
        ivmrescan()
    elif cmd == "streamdrain":
        streamdrain()
    elif cmd == "dvdelete":
        dvdelete()
    else:
        print("usage: r13_experiments.py "
              "{movers|ivmrescan|streamdrain|dvdelete}")
        sys.exit(2)

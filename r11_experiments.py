"""Round-11 measurement harnesses (SCALING.md rows come from here).

Subcommands:

* ``dedupbisect`` — the isolated 6-run-floor protocol (the one that
  closed retrieval_rank in r9) applied to ``incremental_dedup``'s
  unattributed +67% (r10 verdict "what's wrong" #1): the floor is
  measured in a FRESH process per tree — the current tree and git
  worktrees of the r10 (45a4e18) and r9 (4e1ba7d) binaries — with a
  numpy-GEMM calibration in the same process, so code effects separate
  from machine state by construction.
* ``cdcpoll`` — CDC pump poll cost vs churn size: phase 1 = 1M-row
  plain source (verdict task #6's measurement half, the honest
  table-sized-scan shape); phase 2 = 10M-row x 64-bucket manifest
  source+dest, where the churn-pruned CDF + layout-routed dest write
  make polls churn-bucket-sized (~4.5 s at any churn).
* ``vreads`` — the versioned READ path at scale: snapshot read +
  table_changes over many retained versions x 64 buckets at 10M rows,
  hardlink vs manifest layouts (verdict task #7).

Run on a settled machine; each prints its SCALING.md-ready lines.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


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
entry._t(spark, SF, "lineitem").count()
entry._t(spark, SF, "events").count()
entry._t(spark, SF, "documents").count()
q = entry.queries()["incremental_dedup"]
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


def dedupbisect() -> None:
    import os

    trees = [("current", "/root/repo")]
    for label, ref in (("r10-45a4e18", "45a4e18"), ("r9-4e1ba7d", "4e1ba7d")):
        wt = f"/tmp/r11_bisect_{ref}"
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, ref],
                cwd="/root/repo", check=True, capture_output=True,
            )
        trees.append((label, wt))
    results = {}
    for label, cwd in trees:
        out = subprocess.run(
            [sys.executable, "-c", _FLOOR_SNIPPET], cwd=cwd,
            capture_output=True, text=True, timeout=900,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("FLOOR_JSON ")]
        if not line:
            print(f"{label}: FAILED\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            continue
        results[label] = json.loads(line[0][len("FLOOR_JSON "):])
        r = results[label]
        print(f"incremental_dedup isolated floor [{label}]: "
              f"{r['floor']:.3f}s (runs {r['runs']}, gemm {r['gemm']:.4f}s)",
              flush=True)
    if len(results) >= 2:
        print("\nattribution: floors within ~10% of each other across "
              "trees at matching gemm = the r10 bench delta was machine "
              "state / bench-list position, not code; a tree whose floor "
              "stands apart names the commit.")


def cdcpoll() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import upsert_parquet_versioned
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    base = tempfile.mkdtemp(prefix="cdcpoll_")
    src, dst, cur = f"{base}/src", f"{base}/dst", f"{base}/cursor"
    n = 1_000_000

    def rows(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id").cast("string")).alias("v"),
        )

    upsert_parquet_versioned(spark, src, rows(0, n, "a"), ["k"],
                             keep_versions=4)
    t0 = time.monotonic()
    pump_changes_once(spark, src, dst, cur, ["k"])
    boot = time.monotonic() - t0
    print(f"cdc pump bootstrap (1M rows): {boot:6.2f}s", flush=True)

    for churn in (1_000, 100_000):
        upsert_parquet_versioned(spark, src, rows(0, churn, "u"), ["k"],
                                 keep_versions=4)
        t0 = time.monotonic()
        r = pump_changes_once(spark, src, dst, cur, ["k"])
        dt = time.monotonic() - t0
        print(f"cdc pump poll, churn {churn:>7,}: {dt:6.2f}s "
              f"(changed {r['changed']:,})", flush=True)
    t0 = time.monotonic()
    pump_changes_once(spark, src, dst, cur, ["k"])
    print(f"cdc pump idle poll:              {time.monotonic()-t0:6.2f}s",
          flush=True)
    shutil.rmtree(base, ignore_errors=True)

    # phase 2: the churn-pruned configuration — 10M-row x 64-bucket
    # manifest source AND dest (dest pre-created with REPRESENTATIVE
    # bounds; a tiny creation batch degenerates the range layout, the
    # trap documented on the writer). Expect ~4.5 s polls regardless of
    # churn — cost tracks the churn's buckets, not the table.
    from animaltrackingetls_spark.inventory import (
        upsert_parquet_versioned_partitioned,
    )

    base = tempfile.mkdtemp(prefix="cdcpoll_bucketed_")
    src, dst, cur = f"{base}/src", f"{base}/dst", f"{base}/cursor"
    n10 = 10_000_000
    big = spark.range(n10).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    for d in (src, dst):
        upsert_parquet_versioned_partitioned(
            spark, d, big, ["k"], n_buckets=64,
            scheme="range", keep_versions=4, link_mode="manifest",
        )
    t0 = time.monotonic()
    pump_changes_once(spark, src, dst, cur, ["k"],
                      dest_keep_versions=4)
    print(f"bucketed 10M bootstrap-into-prebuilt: {time.monotonic()-t0:5.1f}s",
          flush=True)
    for churn, lo in ((1_000, 20_000), (100_000, 3_000_000)):
        upd = spark.range(lo, lo + churn).select(
            F.col("id").alias("k"), F.lit(-2.0).alias("v"),
        )
        upsert_parquet_versioned_partitioned(
            spark, src, upd, ["k"], n_buckets=64, scheme="range",
            keep_versions=4,
        )
        t0 = time.monotonic()
        r = pump_changes_once(spark, src, dst, cur, ["k"],
                              dest_keep_versions=4)
        print(f"bucketed 10M poll, churn {churn:>7,}: "
              f"{time.monotonic()-t0:5.2f}s (changed {r['changed']:,})",
              flush=True)
    shutil.rmtree(base, ignore_errors=True)


def vreads() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.inventory import (
        list_versions,
        read_versioned,
        upsert_parquet_versioned_partitioned,
    )
    from animaltrackingetls_spark.operators.versioning import table_changes
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n = 10_000_000
    for mode in ("hardlink", "manifest"):
        for n_versions in (10, 100):
            base = tempfile.mkdtemp(prefix=f"vreads_{mode}_")
            t = f"{base}/t"
            big = spark.range(n).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).cast("double").alias("v"),
            )
            upsert_parquet_versioned_partitioned(
                spark, t, big, ["k"], n_buckets=64, scheme="range",
                keep_versions=n_versions, link_mode=mode,
            )
            # n_versions-1 localized 10k-row churn batches -> a deep
            # retained history over the same 10M base
            for i in range(1, n_versions):
                upd = spark.range(i * 10_000, (i + 1) * 10_000).select(
                    F.col("id").alias("k"),
                    F.lit(float(i)).alias("v"),
                )
                upsert_parquet_versioned_partitioned(
                    spark, t, upd, ["k"], n_buckets=64, scheme="range",
                    keep_versions=n_versions,
                )
            vers = list_versions(t)
            # warm once, then time: snapshot read; CDF adjacent; CDF full-span
            read_versioned(spark, t).count()
            t0 = time.monotonic()
            c = read_versioned(spark, t).count()
            t_read = time.monotonic() - t0
            t0 = time.monotonic()
            table_changes(spark, t, ["k"], vers[-2], vers[-1]).count()
            t_cdf1 = time.monotonic() - t0
            t0 = time.monotonic()
            table_changes(spark, t, ["k"], vers[0], vers[-1]).count()
            t_cdfN = time.monotonic() - t0
            print(f"vreads {mode:8s} {n_versions:3d} versions x 64 buckets, "
                  f"{c:,} rows: snapshot {t_read:5.2f}s  "
                  f"cdf-adjacent {t_cdf1:5.2f}s  cdf-fullspan {t_cdfN:5.2f}s",
                  flush=True)
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "dedupbisect":
        dedupbisect()
    elif cmd == "cdcpoll":
        cdcpoll()
    elif cmd == "vreads":
        vreads()
    else:
        print("usage: r11_experiments.py dedupbisect|cdcpoll|vreads")
        sys.exit(2)

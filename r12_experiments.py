"""Round-12 measurement harnesses (SCALING.md rows come from here).

Subcommands:

* ``skipping`` — the round-11 verdict's top task, measured: per-file
  column stats + whole-file skipping on a 10M-row z-ordered plain
  table under a selective predicate. Reports files-opened and
  wall-time for (a) the stats-pruned read, (b) the same predicate as a
  plain filter over the full scan (row-group pruning only), and (c)
  the pre-stats fallback (sidecar removed). Also the bucketed-table
  variant, and the plain-layout CDF's file-identity pruning cost.
* ``packbisect`` — the isolated 6-run-floor protocol on
  ``pack_documents`` (+24% raw in the r11 bench at 8% own spread,
  ``pretrain.py`` untouched — r11 verdict "what's wrong" #1): fresh
  process per tree (current, r11 = 8566e97, r10 = 45a4e18), numpy-GEMM
  calibration in the same process, so code effects separate from
  machine state by construction.
* ``cowmerge`` — copy-on-write merge/delete vs the full rewrite at
  10M rows (write volume tracks churn), plus the plain-dest pump poll.
* ``cdclog`` — write-time CDC: logging's commit-side cost and the
  logged pump poll vs the derived diff at 10M/1k churn.
* ``inccompact`` — incremental bin-packing compaction vs the full
  rewrite on a debris-accreted 10M CoW table.

Run on a settled machine; each prints its SCALING.md-ready lines.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


_PACK_FLOOR_SNIPPET = r'''
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
q = entry.queries()[__import__("os").environ.get("BISECT_QUERY", "pack_documents")]
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


def packbisect() -> None:
    import os

    trees = [("current", "/root/repo")]
    for label, ref in (("r11-8566e97", "8566e97"), ("r10-45a4e18", "45a4e18")):
        wt = f"/tmp/r12_bisect_{ref}"
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, ref],
                cwd="/root/repo", check=True, capture_output=True,
            )
        trees.append((label, wt))
    results = {}
    for label, cwd in trees:
        out = subprocess.run(
            [sys.executable, "-c", _PACK_FLOOR_SNIPPET], cwd=cwd,
            capture_output=True, text=True, timeout=900,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("FLOOR_JSON ")]
        if not line:
            print(f"{label}: FAILED\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            continue
        results[label] = json.loads(line[0][len("FLOOR_JSON "):])
        r = results[label]
        qname = __import__("os").environ.get("BISECT_QUERY", "pack_documents")
        print(f"{qname} isolated floor [{label}]: "
              f"{r['floor']:.3f}s (runs {r['runs']}, gemm {r['gemm']:.4f}s)",
              flush=True)
    if len(results) >= 2:
        print("\nattribution: floors within ~10% of each other across "
              "trees at matching gemm = the r11 bench delta was machine "
              "state / bench-list position, not code; a tree whose floor "
              "stands apart names the commit.")


def skipping() -> None:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import filestats as fstats
    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12skip_")
    N = 10_000_000

    def build(table, **kw):
        df = spark.range(0, N).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("g"),
            (F.hash(F.col("id")) % 100_000).cast("double").alias("x"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        if kw:
            inv.upsert_parquet_versioned_partitioned(
                spark, table, df, ["k"], **kw)
        else:
            inv.upsert_parquet_versioned(spark, table, df, ["k"])
        return table

    def timed(df):
        t0 = time.monotonic()
        n = df.count()
        return n, time.monotonic() - t0

    # --- plain table, z-ordered, many files -----------------------------
    # 2 MiB targets force ~220 files so per-file costs (open, footer
    # decode, scheduler task) are visible locally — the stand-in for an
    # object store where every file is a GET round-trip.
    t = build(os.path.join(tmp, "plain"))
    inv.optimize_versioned(spark, t, ["k", "g"],
                           target_bytes=2 * 1024 * 1024)

    def measure(label, preds, cond, expect):
        kept, total = inv.files_scanned(t, predicates=preds)
        runs = {"pruned": [], "full": [], "nostats": []}
        v = inv._current_version(t)
        sidecar = os.path.join(t, v, fstats.STATS_SIDECAR)
        saved = sidecar + ".saved"
        for _ in range(4):
            n1, s1 = timed(inv.read_versioned(spark, t, predicates=preds))
            runs["pruned"].append(s1)
            n2, s2 = timed(inv.read_versioned(spark, t).filter(cond))
            runs["full"].append(s2)
            os.replace(sidecar, saved)
            try:
                n3, s3 = timed(
                    inv.read_versioned(spark, t, predicates=preds))
            finally:
                os.replace(saved, sidecar)
            runs["nostats"].append(s3)
            assert n1 == n2 == n3, (n1, n2, n3)
            if expect is not None:
                assert n1 == expect, (n1, expect)
        floor = {k: min(v[1:]) for k, v in runs.items()}
        print(f"[skipping/{label}] 10M rows, predicate selects {n1}: "
              f"files {kept}/{total} opened; wall "
              f"pruned={floor['pruned']:.3f}s "
              f"full-scan+filter={floor['full']:.3f}s "
              f"no-sidecar-fallback={floor['nostats']:.3f}s (floors of 3 "
              "after warm-up; all three row-identical)", flush=True)

    # 1-D predicate over a 2-D z-order: partial file pruning (the
    # curve's interleaving spreads one dimension across files)
    measure(
        "plain-zorder-1d",
        [("k", ">=", 1_000_000), ("k", "<", 1_050_000)],
        (F.col("k") >= 1_000_000) & (F.col("k") < 1_050_000),
        50_000,
    )
    # both z dimensions bounded: the clustering's design case
    measure(
        "plain-zorder-2d",
        [("k", ">=", 1_000_000), ("k", "<", 2_000_000),
         ("g", ">=", 100), ("g", "<", 200)],
        (F.col("k") >= 1_000_000) & (F.col("k") < 2_000_000)
        & (F.col("g") >= 100) & (F.col("g") < 200),
        None,
    )

    # --- bucketed table: skipping composes with bucket layout ----------
    preds = [("k", ">=", 1_000_000), ("k", "<", 1_050_000)]
    cond = (F.col("k") >= 1_000_000) & (F.col("k") < 1_050_000)
    b = build(os.path.join(tmp, "bucket"), n_buckets=64, keep_versions=2)
    inv.optimize_versioned(spark, b, ["k", "g"],
                           target_bytes=24 * 1024 * 1024)
    kept_b, total_b = inv.files_scanned(b, predicates=preds)
    n1, s1 = timed(inv.read_versioned(spark, b, predicates=preds))
    n2, s2 = timed(inv.read_versioned(spark, b).filter(cond))
    print(f"[skipping/bucketed-zorder] 64 buckets: files {kept_b}/{total_b} "
          f"opened; wall pruned={s1:.3f}s full={s2:.3f}s "
          f"(rows {n1}=={n2})", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)


def cowmerge() -> None:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import filestats as fstats
    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12cow_")
    N = 10_000_000

    def base_df():
        return spark.range(0, N).select(
            F.col("id").alias("k"),
            (F.hash(F.col("id")) % 100_000).cast("double").alias("x"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )

    def churn(n):
        return spark.range(0, n).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("x"),
            F.lit("updated").alias("payload"),
        )

    def build(table):
        inv.upsert_parquet_versioned(spark, table, base_df(), ["k"],
                                     keep_versions=3)
        # key-SORTED files (1-col OPTIMIZE): the maintenance layout a
        # key-churned CoW table runs — a key-local batch then touches
        # few files. The (k, x-random) z-order tried first scattered
        # every key range across all files (x's bits interleave) and
        # CoW honestly carried 0 — the layout, not the planner.
        inv.optimize_versioned(spark, table, ["k"],
                               target_bytes=24 * 1024 * 1024,
                               keep_versions=3)
        return table

    # --- merge cost: full rewrite vs CoW over the SAME clustered base
    # (a full rewrite destroys the clustering, so sequential
    # measurement on one table would hand CoW a spoiled layout)
    t_full = build(os.path.join(tmp, "t_full"))
    t_cow = build(os.path.join(tmp, "t_cow"))
    for n in (1_000, 100_000):
        u = churn(n)
        t0 = time.monotonic()
        inv.upsert_parquet_versioned(spark, t_full, u, ["k"],
                                     keep_versions=3)
        full_s = time.monotonic() - t0
        t0 = time.monotonic()
        inv.upsert_parquet_versioned(spark, t_cow, u, ["k"],
                                     keep_versions=3, cow=True)
        cow_s = time.monotonic() - t0
        vs = inv.list_versions(t_cow)
        s_prev = fstats.read_stats(t_cow, vs[-2])
        s_now = fstats.read_stats(t_cow, vs[-1])
        ident = lambda s: {(e["ino"], e["size"])
                           for e in s["files"].values()}
        carried = len(ident(s_prev) & ident(s_now))
        print(f"[cowmerge/upsert] 10M rows, churn {n}: full-rewrite "
              f"{full_s:.2f}s vs CoW {cow_s:.2f}s; CoW carried "
              f"{carried}/{len(s_now['files'])} files", flush=True)

    # --- plain-dest pump poll cost (the r11 task-6 measurement) --------
    src = build(os.path.join(tmp, "src"))
    dst, cur = os.path.join(tmp, "dst"), os.path.join(tmp, "cur")
    t0 = time.monotonic()
    pump_changes_once(spark, src, dst, cur, ["k"], dest_keep_versions=3)
    boot_s = time.monotonic() - t0
    # the dest bootstraps as one big write; optimize it so its CoW has
    # a clustered layout to carry (the steady-state maintenance posture)
    inv.optimize_versioned(spark, dst, ["k"],
                           target_bytes=24 * 1024 * 1024, keep_versions=3)
    for n in (1_000,):
        inv.upsert_parquet_versioned(spark, src, churn(n), ["k"],
                                     keep_versions=3, cow=True)
        t0 = time.monotonic()
        r = pump_changes_once(spark, src, dst, cur, ["k"],
                              dest_keep_versions=3)
        poll_s = time.monotonic() - t0
        dvs = inv.list_versions(dst)
        cf = inv.identity_changed_files(dst, dvs[-2], dvs[-1])
        print(f"[cowmerge/pump] 10M PLAIN src+dst, churn {n}: poll "
              f"{poll_s:.2f}s (bootstrap was {boot_s:.1f}s); applied "
              f"{r['changed'] + r['added']} rows; dest rewrote "
              f"{len(cf[1]) if cf else '?'} files", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)


def cdclog() -> None:
    """Write-time CDC, measured twice: (a) what LOGGING costs the
    commit (CoW upsert on a pinned vs unpinned 10M table), and (b)
    what it buys the POLL (pump with the logged fast path vs the
    derived diff over the same churn)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.operators.versioning import (
        pump_changes_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12cdclog_")
    N = 10_000_000

    def base_df():
        return spark.range(0, N).select(
            F.col("id").alias("k"),
            (F.hash(F.col("id")) % 100_000).cast("double").alias("x"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )

    def churn(n, tag):
        return spark.range(0, n).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("x"),
            F.lit(tag).alias("payload"),
        )

    def build(table, cdc):
        inv.upsert_parquet_versioned(
            spark, table, base_df(), ["k"], keep_versions=4,
            write_change_data=cdc,
        )
        inv.optimize_versioned(spark, table, ["k"],
                               target_bytes=24 * 1024 * 1024,
                               keep_versions=4)
        return table

    # --- (a) commit overhead of logging, CoW 1k-churn upserts ---------
    t_plain = build(os.path.join(tmp, "nolog"), cdc=False)
    t_cdc = build(os.path.join(tmp, "log"), cdc=True)
    for i in range(3):
        u = churn(1_000, f"u{i}")
        t0 = time.monotonic()
        inv.upsert_parquet_versioned(spark, t_plain, u, ["k"],
                                     keep_versions=4, cow=True)
        off_s = time.monotonic() - t0
        t0 = time.monotonic()
        inv.upsert_parquet_versioned(spark, t_cdc, u, ["k"],
                                     keep_versions=4, cow=True)
        on_s = time.monotonic() - t0
        print(f"[cdclog/commit] 10M CoW upsert, 1k churn, round {i}: "
              f"unlogged {off_s:.2f}s vs logged {on_s:.2f}s "
              f"(+{on_s - off_s:.2f}s)", flush=True)

    # --- (b) poll cost: logged fast path vs derived diff --------------
    src = t_cdc
    d_log = os.path.join(tmp, "d_log")
    d_der = os.path.join(tmp, "d_der")
    c_log, c_der = os.path.join(tmp, "c_log"), os.path.join(tmp, "c_der")
    for dst, cur in ((d_log, c_log), (d_der, c_der)):
        pump_changes_once(spark, src, dst, cur, ["k"],
                          dest_keep_versions=3)
        inv.optimize_versioned(spark, dst, ["k"],
                               target_bytes=24 * 1024 * 1024,
                               keep_versions=3)
    for i in range(3):
        inv.upsert_parquet_versioned(
            spark, src, churn(1_000, f"p{i}"), ["k"],
            keep_versions=4, cow=True,
        )
        t0 = time.monotonic()
        r1 = pump_changes_once(spark, src, d_log, c_log, ["k"],
                               dest_keep_versions=3)
        log_s = time.monotonic() - t0
        t0 = time.monotonic()
        r2 = pump_changes_once(spark, src, d_der, c_der, ["k"],
                               dest_keep_versions=3,
                               prefer_logged=False)
        der_s = time.monotonic() - t0
        assert r1["source"] == "logged" and r2["source"] == "derived"
        print(f"[cdclog/poll] 10M PLAIN src, 1k churn, round {i}: "
              f"logged {log_s:.2f}s vs derived {der_s:.2f}s", flush=True)
    same = (
        inv.read_versioned(spark, d_log)
        .exceptAll(inv.read_versioned(spark, d_der)).isEmpty()
        and inv.read_versioned(spark, d_der)
        .exceptAll(inv.read_versioned(spark, d_log)).isEmpty()
    )
    print(f"[cdclog/poll] both dests identical: {same}", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)


def inccompact() -> None:
    """Incremental (bin-packing) compaction vs the full rewrite on a
    10M CoW table that accreted insert debris — the steady-state
    maintenance cost question: does compaction track the DEBRIS or the
    TABLE?"""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12inc_")
    N = 10_000_000

    def build(table):
        base = spark.range(0, N).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        inv.upsert_parquet_versioned(spark, table, base, ["k"],
                                     keep_versions=3)
        inv.optimize_versioned(spark, table, ["k"],
                               target_bytes=24 * 1024 * 1024,
                               keep_versions=3)
        # 12 pure-INSERT CoW commits: each accretes one churn-sized
        # file (rewrite of zero touched files) and carries the rest
        for i in range(12):
            ins = spark.range(N + i * 1000, N + (i + 1) * 1000).select(
                F.col("id").alias("k"), F.lit(f"ins{i}").alias("payload"),
            )
            inv.upsert_parquet_versioned(spark, table, ins, ["k"],
                                         keep_versions=3, cow=True)
        return table

    t_inc = build(os.path.join(tmp, "t_inc"))
    t_full = build(os.path.join(tmp, "t_full"))
    n_before = len(inv._snapshot_files(
        t_inc, inv.list_versions(t_inc)[-1]
    ))
    t0 = time.monotonic()
    r_inc = inv.compact_versioned(spark, t_inc, keep_versions=3,
                                  target_bytes=24 * 1024 * 1024,
                                  incremental=True)
    inc_s = time.monotonic() - t0
    t0 = time.monotonic()
    r_full = inv.compact_versioned(spark, t_full, keep_versions=3,
                                   target_bytes=24 * 1024 * 1024)
    full_s = time.monotonic() - t0
    same = (
        inv.read_versioned(spark, t_inc)
        .exceptAll(inv.read_versioned(spark, t_full)).isEmpty()
    )
    print(f"[inccompact] 10M + 12 insert-debris files "
          f"({n_before} files): incremental {inc_s:.2f}s rewrote "
          f"{r_inc['bytes_rewritten'] >> 20} MiB -> "
          f"{r_inc['files_after']} files (packed "
          f"{r_inc['small_files']}); full {full_s:.2f}s rewrote "
          f"{r_full['bytes_rewritten'] >> 20} MiB -> "
          f"{r_full['files_after']} files; data identical: {same}",
          flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


def cdcstream() -> None:
    """Throughput of the `versioned_changes` Python streaming source:
    drain a 5M-row logged creation commit to parquet and compare the
    same rows read through the batch path (JVM parquet scan) — the
    price of the Python-source hop (driver offset planning + per-file
    executor Arrow reads) in rows/s."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.cdc import (
        read_change_data,
        read_changes_stream,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12cdcs_")
    t = os.path.join(tmp, "t")
    N = 5_000_000
    df = spark.range(0, N).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    inv.upsert_parquet_versioned(spark, t, df, ["k"], keep_versions=3,
                                 write_change_data=True)
    # batch path (warm + floor of 3)
    b = []
    for _ in range(4):
        t0 = time.monotonic()
        n_batch = read_change_data(spark, t).count()
        b.append(time.monotonic() - t0)
    batch_s = min(b[1:])
    # JVM twin of the drain: same files, same parquet sink, no Python
    from animaltrackingetls_spark.cdc import change_log

    files = change_log(t, inv.list_versions(t)[-1])
    jvm_out = os.path.join(tmp, "jvm")
    t0 = time.monotonic()
    spark.read.parquet(*files).write.parquet(jvm_out)
    jvm_s = time.monotonic() - t0
    # streaming drain to parquet (one availableNow invocation)
    out, ck = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
    t0 = time.monotonic()
    q = (
        read_changes_stream(spark, t, starting="earliest")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(600)
    stream_s = time.monotonic() - t0
    n_stream = spark.read.parquet(out).count()
    assert n_stream == n_batch == N, (n_stream, n_batch, N)
    print(f"[cdcstream] {N} logged change rows ({len(files)} files): "
          f"batch count floor {batch_s:.2f}s; JVM read+sink twin "
          f"{jvm_s:.2f}s; streaming drain {stream_s:.2f}s "
          f"({N/stream_s/1e6:.2f}M rows/s incl. query startup)",
          flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


def ivm() -> None:
    """Incremental view maintenance vs full recompute at 10M rows:
    maintain a (group -> count, sum) rollup through 1k-churn commits
    and compare the poll's wall to recomputing the groupBy from the
    snapshot each time."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from animaltrackingetls_spark import inventory as inv
    from animaltrackingetls_spark.operators.versioning import (
        maintain_aggregate_once,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(master="local[32]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    tmp = tempfile.mkdtemp(prefix="r12ivm_")
    src, vw, cur = (os.path.join(tmp, d) for d in ("s", "v", "c"))
    N, GROUPS = 10_000_000, 50_000
    df = spark.range(0, N).select(
        F.col("id").alias("k"),
        (F.col("id") % GROUPS).cast("string").alias("g"),
        (F.hash("id") % 1000).cast("double").alias("x"),
    )
    inv.upsert_parquet_versioned(spark, src, df, ["k"], keep_versions=4,
                                 write_change_data=True)
    inv.optimize_versioned(spark, src, ["k"],
                           target_bytes=24 * 1024 * 1024, keep_versions=4)
    t0 = time.monotonic()
    maintain_aggregate_once(spark, src, vw, cur, ["g"], sum_cols=["x"])
    boot_s = time.monotonic() - t0
    for i in range(3):
        churn = spark.range(i * 1000, (i + 1) * 1000).select(
            F.col("id").alias("k"),
            (F.col("id") % GROUPS).cast("string").alias("g"),
            F.lit(-5.0).alias("x"),
        )
        inv.upsert_parquet_versioned(spark, src, churn, ["k"],
                                     keep_versions=4, cow=True)
        t0 = time.monotonic()
        r = maintain_aggregate_once(spark, src, vw, cur, ["g"],
                                    sum_cols=["x"])
        poll_s = time.monotonic() - t0
        t0 = time.monotonic()
        n_full = (
            inv.read_versioned(spark, src).groupBy("g")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count("x").alias("n_x"), F.sum("x").alias("sum_x"))
            .count()
        )
        full_s = time.monotonic() - t0
        print(f"[ivm] 10M x {GROUPS} groups, 1k churn, round {i}: "
              f"incremental poll {poll_s:.2f}s "
              f"({r['groups_touched']} groups touched) vs full "
              f"recompute {full_s:.2f}s ({n_full} groups; bootstrap "
              f"was {boot_s:.1f}s)", flush=True)
    # exactness: the maintained view equals the recompute
    a = inv.read_versioned(spark, vw)
    b = (inv.read_versioned(spark, src).groupBy("g")
         .agg(F.count(F.lit(1)).alias("n_rows"),
              F.count("x").alias("n_x"), F.sum("x").alias("sum_x")))
    same = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    print(f"[ivm] view == recompute: {same}", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "skipping":
        skipping()
    elif cmd == "packbisect":
        packbisect()
    elif cmd == "cowmerge":
        cowmerge()
    elif cmd == "cdclog":
        cdclog()
    elif cmd == "inccompact":
        inccompact()
    elif cmd == "cdcstream":
        cdcstream()
    elif cmd == "ivm":
        ivm()
    else:
        print("usage: r12_experiments.py {skipping|packbisect|cowmerge"
              "|cdclog|inccompact|cdcstream|ivm}")
        sys.exit(2)

"""Round-15 experiments.

* ``movers`` — the isolated 6-run-floor protocol on the FOUR
  unadjudicated round-14 driver-bench movers (r14 verdict "what's
  wrong" #1): ivf_serve (+205% spread-min), sample_audit (+95%),
  zorder_curve (+72%), top_bigrams (+69%). None of their code changed
  in round 14 (the entire r14 entry diff is the _q_versioned_cdf
  freeze plus the two new ivm_view/dv_delete entries) and the r14
  driver bench self-reported catastrophic contention (its own canary
  drifted 8.11x, loadavg 5.4 at exit), so the protocol separates code
  from machine state by construction: fresh process per (tree, query),
  trees = the r14 tree (8ed32b3, what the driver benched) vs the r13
  tree (8d9a51f), 7 runs each (floor = min of the last 6), numpy-GEMM
  calibration in the same process. ``versioned_cdf`` rides along
  against the r12 tree (e2fe455) — its restored-scope baseline (r14
  verdict "what's missing" #7).
* ``dvplan`` — driver plan-build wall for the DV inline path when the
  DV spreads over MANY files (r14 verdict #3): before the file-count
  cap, 1k affected files built a 1k-branch union with 1k codegen'd
  NOT-IN filters; after, the single-scan broadcast anti-join handles
  wide-churn DVs past _DV_INLINE_MAX_FILES.

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

# query -> (new tree, old tree) to compare; the four movers bisect
# r14-vs-r13, versioned_cdf bisects r14-vs-r12 (restored r12 scope)
MOVER_PLANS = {
    "ivf_serve": ("r14-8ed32b3", "r13-8d9a51f"),
    "sample_audit": ("r14-8ed32b3", "r13-8d9a51f"),
    "zorder_curve": ("r14-8ed32b3", "r13-8d9a51f"),
    "top_bigrams": ("r14-8ed32b3", "r13-8d9a51f"),
    "versioned_cdf": ("r14-8ed32b3", "r12-e2fe455"),
}

_REFS = {
    "r14-8ed32b3": "8ed32b3",
    "r13-8d9a51f": "8d9a51f",
    "r12-e2fe455": "e2fe455",
}


def _tree(label: str) -> str:
    import os

    ref = _REFS[label]
    wt = f"/tmp/r15_bisect_{ref}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ref],
            cwd="/root/repo", check=True, capture_output=True,
        )
    return wt


def movers() -> None:
    import os

    for qname, (new_label, old_label) in MOVER_PLANS.items():
        results = {}
        for label in (new_label, old_label):
            cwd = _tree(label)
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
            new, old = results[new_label], results[old_label]
            ratio = new["floor"] / old["floor"] if old["floor"] else 0
            print(f"  -> {new_label}/{old_label} floor ratio "
                  f"{ratio:.2f} (within ~1.10 at matching gemm = "
                  "machine state, not code)", flush=True)


def dvplan() -> None:
    """Plan-build wall for a small DV spread over many files: 10k DV
    rows over 1k files sits under the 16k row cap but (pre-fix) built
    a 1k-branch per-file union. Measures the time to PLAN the scoped
    read (DataFrame construction + explain, no execution) and one
    count execution, at 64 and 1000 affected files."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, ".")
    from animaltrackingetls_spark.inventory import (
        delete_versioned,
        list_versions,
        read_versioned,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import animaltrackingetls_spark.inventory as inv

    for n_files, n_dv in ((64, 640), (1000, 10000)):
        tmp = tempfile.mkdtemp(prefix="dvplan_")
        t = os.path.join(tmp, "t")
        n_rows = n_files * 1000
        # force a genuinely wide layout: an EXPLICIT key repartition
        # survives AQE (user-pinned partition count) and the writer's
        # merge window collapses onto it, so the snapshot lands as
        # n_files real files
        df = spark.range(0, n_rows).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("g"),
        ).repartition(n_files, "k")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_files))
        try:
            upsert_parquet_versioned(spark, t, df, ["k"],
                                     keep_versions=3)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        n_actual = len(inv._snapshot_files(
            t, list_versions(t)[-1]))
        print(f"dvplan files={n_files}: actual data files {n_actual}",
              flush=True)
        # n_dv keys spread evenly over every file (stride = rows/file)
        stride = n_rows // n_dv
        doomed = spark.range(0, n_dv).select(
            (F.col("id") * stride).alias("k"))
        delete_versioned(spark, t, doomed, ["k"], keep_versions=3,
                         dv=True)
        real_cap = inv._DV_INLINE_MAX_FILES
        for tag, cap in (("inline(pre-fix)", 10**9),
                         ("capped(post-fix)", real_cap)):
            inv._DV_INLINE_MAX_FILES = cap
            try:
                t0 = time.monotonic()
                scoped = read_versioned(spark, t)
                scoped.explain(mode="simple")  # forces full plan build
                plan_s = time.monotonic() - t0
                t1 = time.monotonic()
                cnt = scoped.count()
                exec_s = time.monotonic() - t1
                assert cnt == n_rows - n_dv, (cnt, n_rows, n_dv)
                print(f"dvplan files={n_files} dv_rows={n_dv} [{tag}]: "
                      f"plan {plan_s:.2f}s, count {exec_s:.2f}s "
                      f"(versions {len(list_versions(t))})", flush=True)
            finally:
                inv._DV_INLINE_MAX_FILES = real_cap
        shutil.rmtree(tmp, ignore_errors=True)


def constraints_overhead() -> None:
    """Write-path cost of constraint enforcement at 10M rows: the
    claim is ONE extra aggregation job over the BATCH (churn-sized),
    independent of table size and of how many constraints exist.
    Measures a 100k-row upsert into a 10M-row versioned table three
    ways: no constraints, 1 check, and 4 checks + 1 generated column
    (all folded into the same single agg)."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, ".")
    from animaltrackingetls_spark.constraints import (
        add_check_constraint,
        set_generated_column,
    )
    from animaltrackingetls_spark.inventory import upsert_parquet_versioned
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n_rows, n_batch = 10_000_000, 100_000

    def batch(salt: int):
        return spark.range(0, n_batch).select(
            (F.col("id") * 100 + salt).alias("k"),
            (F.col("id") % 1000 + 1).alias("qty"),
            ((F.col("id") % 1000 + 1) * 2).alias("qty2"),
        )

    def timed_upsert(t, salt):
        b = batch(salt)
        t0 = time.monotonic()
        upsert_parquet_versioned(spark, t, b, ["k"], keep_versions=2)
        return time.monotonic() - t0

    for tag, setup in (
        ("none", lambda t: None),
        ("1check", lambda t: add_check_constraint(
            spark, t, "qty_pos", "qty > 0")),
        ("4checks+gen", lambda t: (
            add_check_constraint(spark, t, "qty_pos", "qty > 0"),
            add_check_constraint(spark, t, "qty_hi", "qty <= 1000"),
            add_check_constraint(spark, t, "k_nn", "k IS NOT NULL"),
            add_check_constraint(spark, t, "pair", "qty2 >= qty"),
            set_generated_column(spark, t, "qty2", "qty * 2"),
        )),
    ):
        tmp = tempfile.mkdtemp(prefix="cns_ovh_")
        t = os.path.join(tmp, "t")
        seed = spark.range(0, n_rows).select(
            F.col("id").alias("k"), (F.col("id") % 1000 + 1).alias("qty"),
            ((F.col("id") % 1000 + 1) * 2).alias("qty2"),
        )
        upsert_parquet_versioned(spark, t, seed, ["k"], keep_versions=2)
        t_alter0 = time.monotonic()
        setup(t)
        alter_s = time.monotonic() - t_alter0
        warm = timed_upsert(t, 1)  # warm the merge path
        runs = [timed_upsert(t, 2 + i) for i in range(3)]
        print(f"cns_overhead [{tag}]: alters {alter_s:.2f}s, "
              f"upsert warm {warm:.2f}s, "
              f"runs {['%.2f' % r for r in runs]}, min {min(runs):.2f}s",
              flush=True)
        shutil.rmtree(tmp, ignore_errors=True)


def schema_alter() -> None:
    """RENAME/DROP COLUMN cost at 10M rows — these are FULL-REWRITE
    commits (no column-mapping layer), so the honest claim is "one
    distributed rewrite of the snapshot", measured here next to the
    table's own build cost for scale context."""
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, ".")
    from animaltrackingetls_spark.inventory import (
        drop_column,
        read_versioned,
        rename_column,
        upsert_parquet_versioned,
    )
    from animaltrackingetls_spark.session import get_spark

    spark = get_spark(
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n_rows = 10_000_000
    tmp = tempfile.mkdtemp(prefix="alter10m_")
    t = os.path.join(tmp, "t")
    seed = spark.range(0, n_rows).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("qty"),
        F.sha1(F.col("id").cast("string")).alias("tag"),
    )
    t0 = time.monotonic()
    upsert_parquet_versioned(spark, t, seed, ["k"], keep_versions=2)
    build_s = time.monotonic() - t0
    t1 = time.monotonic()
    rename_column(spark, t, "qty", "quantity", keep_versions=2)
    rename_s = time.monotonic() - t1
    t2 = time.monotonic()
    drop_column(spark, t, "tag", keep_versions=2)
    drop_s = time.monotonic() - t2
    assert read_versioned(spark, t).columns == ["k", "quantity"]
    print(f"schema_alter 10M: build {build_s:.1f}s, "
          f"rename {rename_s:.1f}s, drop {drop_s:.1f}s", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "movers"
    {"movers": movers, "dvplan": dvplan,
     "constraints": constraints_overhead,
     "schema_alter": schema_alter}[cmd]()

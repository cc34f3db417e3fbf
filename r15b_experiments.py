"""Round-15 (resumed session) isolated experiments.

Each experiment runs on an idle machine (loadavg checked), uses the noop
sink (guide §1.4), interleaves arms A/B/A/B... so slow-host drift hits
both arms equally, and prints medians + a gemm floor probe.

Usage: python r15b_experiments.py <experiment>
  quantile   — decompose quantile_profile: scan / per-column percentile /
               full agg / no-extendedprice, to locate the seconds.
  bigrams    — top_bigrams: shared localCheckpoint of the bigram frame
               feeding both branches vs the current two-pass shape.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

from pyspark.sql import functions as F

from animaltrackingetls_spark.session import get_spark

import __spark_entry__ as entry
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


#: frames an arm materialized mid-build (localCheckpoint etc.) — the
#: arm appends, _interleave unpersists after each timed run so block-
#: manager storage cannot grow across runs and distort later ones
_CLEANUP: list = []


def _timed_arm(fn) -> float:
    """Time DataFrame CONSTRUCTION + noop execution as one unit: an arm
    that eagerly materializes inside fn() (localCheckpoint) would
    otherwise do its heavy pass before the timer starts, systematically
    understating its cost vs arms that pay everything inside the noop."""
    t0 = time.monotonic()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    while _CLEANUP:
        try:
            _CLEANUP.pop().unpersist()
        except Exception:
            pass
    return dt


def _interleave(arms: dict, runs: int = 5) -> None:
    """arms: name -> zero-arg fn returning a DataFrame. Warm each once,
    then interleave timed (construction + noop) runs."""
    spark = _spark()
    sc = spark.sparkContext
    print(f"gemm floor: {bench.gemm_probe(5):.4f}s  loadavg {os.getloadavg()}")
    for name, fn in arms.items():
        sc.setJobDescription(f"warm:{name}")
        _timed_arm(fn)
    walls: dict = {name: [] for name in arms}
    for i in range(runs):
        for name, fn in arms.items():
            sc.setJobDescription(f"run{i}:{name}")
            walls[name].append(_timed_arm(fn))
    sc.setJobDescription(None)
    print(f"gemm floor after: {bench.gemm_probe(5):.4f}s")
    for name, ws in walls.items():
        print(
            f"{name}: median {statistics.median(ws):.3f}s "
            f"min {min(ws):.3f}s walls={[round(w, 3) for w in ws]}"
        )


def quantile() -> None:
    from animaltrackingetls_spark.operators import layout, profile

    spark = _spark()

    def li():
        return entry._t(spark, SF_DIR, "lineitem").select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        )

    probs = (0.01, 0.25, 0.5, 0.75, 0.99)

    arms = {
        "scan_only": lambda: layout.ensure_scan_parallelism(li()),
        "full": lambda: profile.profile_quantiles(
            layout.ensure_scan_parallelism(li()),
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            probs,
        ).orderBy("col_name", "prob"),
        "no_extprice": lambda: profile.profile_quantiles(
            layout.ensure_scan_parallelism(li()),
            ["l_quantity", "l_discount", "l_tax"],
            probs,
        ).orderBy("col_name", "prob"),
        "extprice_only": lambda: profile.profile_quantiles(
            layout.ensure_scan_parallelism(li()),
            ["l_extendedprice"],
            probs,
        ).orderBy("col_name", "prob"),
        "quantity_only": lambda: profile.profile_quantiles(
            layout.ensure_scan_parallelism(li()),
            ["l_quantity"],
            probs,
        ).orderBy("col_name", "prob"),
    }
    _interleave(arms, runs=5)


def bigrams() -> None:
    from animaltrackingetls_spark.operators import dedup
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    spark = _spark()

    def current():
        return entry.queries()["top_bigrams"](spark, SF_DIR)

    def shared():
        docs = entry._t(spark, SF_DIR, "documents")
        bg = (
            dedup.shingle_frame(docs, "doc_id", "text", 2)
            .select(F.explode("sh").alias("bigram"))
            .localCheckpoint(eager=True)
        )
        _CLEANUP.append(bg)  # unpersisted by _timed_arm after the run
        exact = (
            bg.groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("bigram"))
            .limit(20)
        )
        stats: dict = {}
        hh = approx_top_k(
            bg, "bigram", k=20, per_partition_m=1024, stats=stats
        ).select("bigram", F.col("n").alias("n_docs"))
        assert stats["proven_exact"]
        return exact.select(F.lit("exact").alias("kind"), "*").unionByName(
            hh.select(F.lit("hh").alias("kind"), "*")
        )

    _interleave({"current": current, "shared_ckpt": shared}, runs=5)


if __name__ == "__main__":
    globals()[sys.argv[1]]()

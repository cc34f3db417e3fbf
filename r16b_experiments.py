"""Round-16 continuation experiments (guide §1.1/§1.4 protocol).

Same protocol as r16_experiments.py: noop sink, interleaved arms,
construction + execution timed as one unit, gemm floor probes, medians
over >= 5 runs.

Usage: python r16b_experiments.py <experiment>
  quantile_arrow — quantile_profile: JVM `percentile` aggregate vs the
                   r16b Arrow twin (_exact_quantiles_arrow).
  bigrams_ckpt   — top_bigrams: three shingle passes per run (exact
                   groupBy + hh candidates + hh recount) vs ONE pass
                   shared through an eager localCheckpoint of the
                   exploded bigram frame.
  bigrams_parts  — top_bigrams decomposition: shingle pass alone,
                   exact branch alone, hh branch alone.
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

_CLEANUP: list = []


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _timed_arm(fn) -> float:
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


# ---------------------------------------------------------------------------
# quantile_profile Arrow twin
# ---------------------------------------------------------------------------


def quantile_arrow() -> None:
    from animaltrackingetls_spark.operators import layout, profile

    spark = _spark()
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    probs = (0.01, 0.25, 0.5, 0.75, 0.99)

    def li():
        return layout.ensure_scan_parallelism(
            entry._t(spark, SF_DIR, "lineitem").select(*cols)
        )

    def _unpivot(one):
        entries = [
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(float(p)).alias("prob"),
                F.round(F.col(f"_q_{c}")[i].cast("double"), 6).alias("q"),
            )
            for c in cols
            for i, p in enumerate(probs)
        ]
        return (
            one.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.*")
            .orderBy("col_name", "prob")
        )

    def jvm():
        plist = ", ".join(repr(float(p)) for p in probs)
        aggs = [
            F.expr(f"percentile(`{c}`, array({plist}))").alias(f"_q_{c}")
            for c in cols
        ]
        return _unpivot(li().agg(*aggs))

    def arrow():
        return _unpivot(profile._exact_quantiles_arrow(li(), cols, probs))

    _interleave({"jvm": jvm, "arrow": arrow}, runs=5)


# ---------------------------------------------------------------------------
# top_bigrams shared-checkpoint bigram frame
# ---------------------------------------------------------------------------


def _bg(spark):
    from animaltrackingetls_spark.operators import dedup

    docs = entry._t(spark, SF_DIR, "documents")
    return dedup.shingle_frame(docs, "doc_id", "text", 2).select(
        F.explode("sh").alias("bigram")
    )


def _top_bigrams_from(bg):
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    exact = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(20)
    )
    stats: dict = {}
    hh = approx_top_k(bg, "bigram", k=20, per_partition_m=1024, stats=stats).select(
        "bigram", F.col("n").alias("n_docs")
    )
    if not stats["proven_exact"]:
        raise AssertionError(f"certificate failed: {stats}")
    return exact.select(F.lit("exact").alias("kind"), "*").unionByName(
        hh.select(F.lit("hh").alias("kind"), "*")
    )


def bigrams_ckpt() -> None:
    spark = _spark()

    def current():
        return _top_bigrams_from(_bg(spark))

    def shared():
        bg = _bg(spark).localCheckpoint(eager=True)
        _CLEANUP.append(bg)
        return _top_bigrams_from(bg)

    _interleave({"current": current, "shared": shared}, runs=5)


def bigrams_parts() -> None:
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    spark = _spark()

    def shingle_only():
        return _bg(spark)

    def exact_only():
        return (
            _bg(spark)
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("bigram"))
            .limit(20)
        )

    def hh_only():
        stats: dict = {}
        return approx_top_k(
            _bg(spark), "bigram", k=20, per_partition_m=1024, stats=stats
        )

    _interleave(
        {"shingle_only": shingle_only, "exact_only": exact_only,
         "hh_only": hh_only},
        runs=3,
    )


if __name__ == "__main__":
    globals()[sys.argv[1]]()

"""Round-7 measurements.

1. Degenerate-block quadratic guard: one shingle present in 100% of
   documents. Uncapped, the inverted-index join fans out df^2 on that
   shingle (quadratic in corpus size); with ``max_shingle_df`` the
   universal shingle is excluded from candidate generation and the work
   is bounded by cap x shingle rows (linear). Results land in SCALING.md.

2. global_order_index at 100x replicated sf0.1 events (the round-6
   100x sweep covered spans/GEMM/fuzzy-dedup; this closes the ordering
   primitive): range exchange + per-partition counts + broadcast
   offsets, verified by min/max/count of the produced index.

3. Skewed per-key cap: one domain holding ~97% of the corpus, plain
   full-window cap_per_key vs the prefiltered cap_per_key_random.

4. Skewed token-budget sampling: same hot-domain fixture, budget in
   tokens instead of rows.

Run: python r7_experiments.py degenerate|order100|skewcap|skewtok
"""
from __future__ import annotations

import sys
import time

from animaltrackingetls_spark.operators import dedup
from animaltrackingetls_spark.session import get_spark


def degenerate_block(spark):
    """Time ngram_jaccard_pairs on corpora where EVERY doc shares one
    3-gram, uncapped vs max_shingle_df=8, at 1x and 4x size."""
    for n in (3000, 12000):
        rows = [
            (i, f"every doc shares unique{i} grams{i} tail{i} z{i}")
            for i in range(n)
        ]
        rows.append((n, "every doc shares unique7 grams7 tail7 z7 extra"))
        docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
        docs.count()
        for cap in (None, 8):
            t0 = time.time()
            got = dedup.ngram_jaccard_pairs(
                docs, threshold=0.4, max_shingle_df=cap
            ).count()
            dt = time.time() - t0
            print(
                f"degenerate n={n + 1} cap={cap}: {dt:.2f}s, {got} pairs",
                flush=True,
            )
        docs.unpersist()


def order100(spark):
    import functools

    from pyspark.sql import functions as F

    from animaltrackingetls_spark.io import load_table
    from animaltrackingetls_spark.operators.ordering import global_order_index

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    for copies in (10, 100):
        frames = [
            ev.select(
                (F.col("event_id") + r * 10_000_000).alias("event_id"),
                "ts", "user_id", "event_type", "value",
            )
            for r in range(copies)
        ]
        big = functools.reduce(lambda a, b: a.unionByName(b), frames)
        t0 = time.time()
        stats = {}
        idx = global_order_index(
            big, ["ts", "event_id"], num_partitions=64, stats=stats
        )
        agg = idx.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("global_idx").alias("lo"),
            F.max("global_idx").alias("hi"),
        ).first()
        dt = time.time() - t0
        assert agg.lo == 0 and agg.hi == agg.n - 1, agg
        print(
            f"global_order_index x{copies}: {dt:.2f}s rows={agg.n} "
            f"dense 0..{agg.hi} partitions={len(stats['partition_sizes'])} "
            f"max_part={max(stats['partition_sizes'])}",
            flush=True,
        )


def skewcap(spark):
    from pyspark.sql import functions as F

    from animaltrackingetls_spark.operators.sampling import (
        cap_per_key,
        cap_per_key_random,
    )

    hot_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    big = spark.range(hot_n).select(F.lit("hot.example").alias("dom"), "id")
    tail = spark.range(hot_n, hot_n + 100_000).select(
        F.concat(F.lit("d"), (F.col("id") % 5000).cast("string")).alias("dom"), "id"
    )
    df = big.unionByName(tail).cache()
    df.count()
    pri = F.md5(F.concat(F.lit("0:"), F.col("id").cast("string")))
    t0 = time.time()
    a = cap_per_key(
        df.withColumn("_p", pri), "dom", 5, [F.asc("_p")], id_col="id"
    ).count()
    t1 = time.time()
    b = cap_per_key_random(df, "dom", 5, "id", seed=0).count()
    t2 = time.time()
    print(
        f"skewcap {hot_n + 100_000} rows / 5001 keys (one key={hot_n}): plain window "
        f"{t1-t0:.2f}s ({a} kept) vs skew-safe {t2-t1:.2f}s ({b} kept)",
        flush=True,
    )
    df.unpersist()


def skewtok(spark):
    from pyspark.sql import Window, functions as F

    from animaltrackingetls_spark.operators.sampling import token_budget_sample

    hot_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    big = spark.range(hot_n).select(
        F.lit("hot.example").alias("dom"), "id", ((F.col("id") % 37) + 1).alias("toks")
    )
    tail = spark.range(hot_n, hot_n + 100_000).select(
        F.concat(F.lit("d"), (F.col("id") % 5000).cast("string")).alias("dom"),
        "id", ((F.col("id") % 37) + 1).alias("toks"),
    )
    df = big.unionByName(tail).cache()
    df.count()
    pri = F.md5(F.concat(F.lit("0:"), F.col("id").cast("string")))
    w = Window.partitionBy("dom").orderBy(F.asc("_p"), F.asc("id"))
    t0 = time.time()
    a = (
        df.withColumn("_p", pri)
        .withColumn("_c", F.sum("toks").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(F.col("_c") - F.col("toks") < 500)
        .count()
    )
    t1 = time.time()
    b = token_budget_sample(df, "dom", "toks", 500, "id", seed=0).count()
    t2 = time.time()
    print(
        f"skewtok {hot_n + 100_000} rows (one key={hot_n}): plain window "
        f"{t1-t0:.2f}s ({a} kept) vs skew-safe {t2-t1:.2f}s ({b} kept)",
        flush=True,
    )
    df.unpersist()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "degenerate"
    s = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "48g"})
    if which == "degenerate":
        degenerate_block(s)
    elif which == "order100":
        order100(s)
    elif which == "skewcap":
        skewcap(s)
    elif which == "skewtok":
        skewtok(s)

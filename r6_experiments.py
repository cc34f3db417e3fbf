"""Round-6 scale experiments: global ordering, heavy hitters, int8 ANN.

Each prints one labeled timing line; results land in SCALING.md.
Run: python r6_experiments.py
"""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from animaltrackingetls_spark.session import get_spark


def timed(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.2f}s ({out})", flush=True)
    return dt


def main():
    spark = get_spark(
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # --- 1. global ordering: naive single-partition window vs two-pass ---
    n = 20_000_000
    base = (
        spark.range(n)
        .select(
            ((F.col("id") * 2654435761) % 4294967296).alias("uid"),
            (F.col("id") % 13).alias("grp"),
        )
        .localCheckpoint(eager=True)
    )
    from animaltrackingetls_spark.operators.ordering import global_order_index

    def naive():
        w = Window.orderBy("grp", "uid")
        return (
            base.withColumn("gidx", F.row_number().over(w).cast("long") - 1)
            .agg(F.sum("gidx"))
            .first()[0]
        )

    def twopass():
        return (
            global_order_index(base, ["grp", "uid"], num_partitions=32)
            .agg(F.sum("global_idx"))
            .first()[0]
        )

    t_naive = timed(f"order/naive-window n={n}", naive)
    t_two = timed(f"order/two-pass    n={n}", twopass)
    print(f"order speedup: {t_naive / t_two:.2f}x", flush=True)

    # --- 2. heavy hitters: full groupBy vs candidate+recount, 5M distinct ---
    hh = (
        spark.range(30_000_000)
        .select(
            F.when(
                F.col("id") % 10 < 3, F.concat(F.lit("hot"), (F.col("id") % 50))
            )
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 5_000_000)))
            .alias("tok")
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    from animaltrackingetls_spark.operators.aggregates import approx_top_k

    from animaltrackingetls_spark.plans.metrics import execution_metrics

    hh_metrics = {}

    def exact_hh():
        top = (
            hh.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("tok"))
            .limit(20)
        )
        out = top.collect()[-1]["n"]
        hh_metrics["exact"] = execution_metrics(top)["shuffle_bytes_written"]
        return out

    stats: dict = {}

    def cand_hh():
        # k=10 stays inside the 15 hot keys (~600k each); m=256 puts the
        # certificate threshold at n/257 ~ 117k, well under them
        return approx_top_k(hh, "tok", k=10, per_partition_m=256, stats=stats).collect()[
            -1
        ]["n"]

    t_ex = timed("hh/full-groupBy  30M rows, 3.5M distinct", exact_hh)
    t_hh = timed("hh/cand+recount  30M rows, 3.5M distinct", cand_hh)
    # candidate-path shuffle bytes: run WITHOUT stats so the returned
    # frame is the live distributed plan (stats mode returns literals)
    cand_frame = approx_top_k(hh, "tok", k=10, per_partition_m=256)
    cand_frame.collect()
    hh_metrics["cand"] = execution_metrics(cand_frame)["shuffle_bytes_written"]
    print(
        f"hh wall ratio: {t_ex / t_hh:.2f}x proven_exact={stats.get('proven_exact')} "
        f"MEASURED shuffle bytes: full-groupBy {hh_metrics.get('exact')} vs "
        f"cand+recount {hh_metrics.get('cand')}",
        flush=True,
    )

    # --- 3. int8 quantized vs exact double brute-force top-k ---
    from animaltrackingetls_spark.io import load_table
    from animaltrackingetls_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_quantized,
        quantize_embeddings_int8,
    )

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    corpus = (
        emb.crossJoin(spark.range(10).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"), "embedding"
        )
        .localCheckpoint(eager=True)
    )  # 50k vectors
    queries = corpus.filter(F.col("vec_id") < 20)

    def exact_ann():
        return brute_force_topk(corpus, queries, k=10).count()

    qz = quantize_embeddings_int8(corpus).localCheckpoint(eager=True)
    qq = qz.filter(F.col("vec_id") < 20)

    def quant_ann():
        return brute_force_topk_quantized(qz, qq, k=10).count()

    t_e = timed("ann/exact-double  50k corpus x 20 queries", exact_ann)
    t_q = timed("ann/int8-quant    50k corpus x 20 queries", quant_ann)
    print(f"ann wall ratio: {t_e / t_q:.2f}x", flush=True)

    # the int8 claim is BYTES, not local wall: materialize both corpus
    # forms to parquet and compare on-disk size (wire/cache scale the same)
    import os
    import tempfile

    d = tempfile.mkdtemp()
    corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).write.mode(
        "overwrite"
    ).parquet(f"{d}/double")
    qz.select("vec_id", "qvec").write.mode("overwrite").parquet(f"{d}/int8")

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dirs, fs in os.walk(p)
            for f in fs
        )

    b_d, b_q = du(f"{d}/double"), du(f"{d}/int8")
    print(
        f"ann bytes: double-parquet {b_d} vs int8-parquet {b_q} "
        f"({b_d / b_q:.1f}x smaller)",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Round-8 measurements.

1. ``tokcurve`` — token-budget sampling crossover CURVE: one hot
   domain of N rows (N swept over decades) plus a 100k-row balanced
   tail, plain cumulative-sum window (mode='window') vs the
   hash-threshold prefilter (mode='prefilter'), identical kept sets
   asserted. Locates the wall-clock crossover that
   sampling._TOK_SKEW_THRESHOLD encodes for mode='auto'.

2. ``capcurve`` — the same sweep for the per-key random cap
   (cap_per_key_random window vs prefilter), extending round 7's two
   points (3M: window wins; 30M: crossover) toward 300M (the curve's
   direction, per the round-7 verdict).

Sizes above 30M are generated on the fly (spark.range is free to
recompute and both arms pay it equally) — caching a 300M-row fixture
buys nothing but heap pressure.

Run: python r8_experiments.py tokcurve|capcurve [sizes...]
"""
from __future__ import annotations

import sys
import time

from animaltrackingetls_spark.session import get_spark
from pyspark.sql import functions as F


def _fixture(spark, hot_n: int, cache: bool):
    big = spark.range(hot_n).select(
        F.lit("hot.example").alias("dom"), "id", ((F.col("id") % 37) + 1).alias("toks")
    )
    tail = spark.range(hot_n, hot_n + 100_000).select(
        F.concat(F.lit("d"), (F.col("id") % 5000).cast("string")).alias("dom"),
        "id",
        ((F.col("id") % 37) + 1).alias("toks"),
    )
    df = big.unionByName(tail)
    if cache:
        df = df.cache()
        df.count()
    return df


def tokcurve(spark, sizes):
    from animaltrackingetls_spark.operators.sampling import token_budget_sample

    for hot_n in sizes:
        df = _fixture(spark, hot_n, cache=hot_n <= 30_000_000)
        t0 = time.time()
        a = token_budget_sample(df, "dom", "toks", 500, "id", seed=0, mode="window").count()
        t1 = time.time()
        b = token_budget_sample(
            df, "dom", "toks", 500, "id", seed=0, mode="prefilter"
        ).count()
        t2 = time.time()
        assert a == b, (a, b)
        print(
            f"tokcurve hot={hot_n:>11,}: window {t1-t0:7.2f}s  "
            f"prefilter {t2-t1:7.2f}s  (kept {a:,})",
            flush=True,
        )
        if df.is_cached:
            df.unpersist()


def capcurve(spark, sizes):
    from animaltrackingetls_spark.operators.sampling import cap_per_key_random

    for hot_n in sizes:
        df = _fixture(spark, hot_n, cache=hot_n <= 30_000_000)
        t0 = time.time()
        a = cap_per_key_random(df, "dom", 5, "id", seed=0, mode="window").count()
        t1 = time.time()
        b = cap_per_key_random(df, "dom", 5, "id", seed=0, mode="prefilter").count()
        t2 = time.time()
        assert a == b, (a, b)
        print(
            f"capcurve hot={hot_n:>11,}: window {t1-t0:7.2f}s  "
            f"prefilter {t2-t1:7.2f}s  (kept {a:,})",
            flush=True,
        )
        if df.is_cached:
            df.unpersist()


def pslscale(spark, sizes):
    """Full-PSL derivation vs the heuristic expression over synthetic
    URL corpora: the join form's broadcast overhead is per-ACTION
    (flat), so its per-row cost should converge toward the heuristic's
    as the corpus grows — the claim in SCALING.md's cost-anatomy row,
    demonstrated instead of asserted."""
    from animaltrackingetls_spark.operators import web

    rules = web.parse_psl_rules(
        ["com", "org", "net", "uk", "co.uk", "org.uk", "jp", "ac.jp",
         "*.kawasaki.jp", "!city.kawasaki.jp", "*.ck", "!www.ck"]
    )
    for n in sizes:
        ids = spark.range(n)
        tld = (
            F.when(F.col("id") % 5 == 0, ".co.uk")
            .when(F.col("id") % 5 == 1, ".ac.jp")
            .when(F.col("id") % 5 == 2, ".kawasaki.jp")
            .when(F.col("id") % 5 == 3, ".org")
            .otherwise(".com")
        )
        sub = F.when(F.col("id") % 3 == 0, "www.").otherwise("")
        urls = ids.select(
            "id",
            F.concat(
                F.lit("https://"), sub, F.lit("h"),
                (F.col("id") % 99_999).cast("string"), tld,
                F.lit("/p/"), F.col("id").cast("string"),
            ).alias("url"),
        )
        hosted = urls.withColumn("_host", web.url_host(F.col("url")))
        t0 = time.time()
        a = hosted.select(
            web.registered_domain(F.col("_host")).alias("rd")
        ).filter(F.col("rd").isNotNull()).count()
        t1 = time.time()
        b = (
            web.registered_domain_psl(hosted, "_host", rules, out_col="rd")
            .filter(F.col("rd").isNotNull())
            .count()
        )
        t2 = time.time()
        print(
            f"pslscale n={n:>11,}: heuristic {t1-t0:6.2f}s ({a:,} rows)  "
            f"full-psl {t2-t1:6.2f}s ({b:,} rows)",
            flush=True,
        )


def ivfserve(spark, sizes):
    """IVF serving at a corpus size where pruning matters: build an
    index over N synthetic 64-dim vectors (driver-fit k-means on a
    bounded sample — the documented 100 TB posture), save it
    partitionBy(cell), then time searches over the LOADED index with
    and without cell pruning. The pruned search should be roughly
    probe_fraction of the unpruned scan cost, proving the
    partitionBy(cell) layout does what the docstring claims at scale
    (the registered ivf_serve query's sf0.1 corpus is only 5k vectors
    — too small for the read cost to show)."""
    import tempfile

    from animaltrackingetls_spark.operators import similarity

    n_cells = 64
    for n in sizes:
        # deterministic pseudo-gaussian-ish vectors from hash mixing —
        # Date-free, partitioning-independent
        vecs = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 1000.0
                ) / 1000.0,
            ).alias("embedding"),
        )
        t0 = time.time()
        index = similarity.ivf_index(
            vecs, n_centroids=n_cells, fit_impl="driver", max_train_rows=20_000
        )
        path = tempfile.mkdtemp(prefix="ivfserve_")
        similarity.save_ivf_index(index, path)
        t1 = time.time()
        loaded = similarity.load_ivf_index(spark, path)
        queries = vecs.filter(F.col("vec_id") < 8)
        t2 = time.time()
        full = similarity.ivf_search(
            loaded, queries, k=10, n_probe=4, prune_cells=False
        ).count()
        t3 = time.time()
        pruned = similarity.ivf_search(
            loaded, queries, k=10, n_probe=4, prune_cells=True
        ).count()
        t4 = time.time()
        print(
            f"ivfserve n={n:>10,} cells={n_cells} probe=4: build+save "
            f"{t1-t0:6.1f}s  search full-scan {t3-t2:6.2f}s ({full} rows)  "
            f"pruned {t4-t3:6.2f}s ({pruned} rows)",
            flush=True,
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "tokcurve"
    sizes = [int(x) for x in sys.argv[2:]] or {
        "tokcurve": [300_000, 1_000_000, 3_000_000, 10_000_000, 30_000_000],
        "capcurve": [30_000_000, 100_000_000, 300_000_000],
        "pslscale": [100_000, 1_000_000, 10_000_000],
        "ivfserve": [1_000_000],
    }[which]
    s = get_spark(
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "48g",
        }
    )
    {
        "tokcurve": tokcurve,
        "capcurve": capcurve,
        "pslscale": pslscale,
        "ivfserve": ivfserve,
    }[which](s, sizes)

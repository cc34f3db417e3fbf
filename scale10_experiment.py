"""10x-replication scaling run for the two heaviest registered
pipelines: end-to-end fuzzy dedup (portable MinHash+LSH candidates →
bigram-Jaccard verify → connected components → keep-list) and blocked
embedding near-dup.

Replication follows the SCALING.md convention: sf0.1 inputs unioned
``copies`` times with shifted ids; document text gets a per-replica
suffix and embeddings a small deterministic per-replica perturbation so
replicas are not trivially-identical rows (which would measure output
explosion, not operator scaling) while genuine near-dup structure still
grows with the corpus. Medians of 3 warm runs on cached inputs.

    python scale10_experiment.py
"""
from __future__ import annotations

import functools
import json
import statistics
import time

from pyspark.sql import functions as F

from animaltrackingetls_spark.io import load_table
from animaltrackingetls_spark.operators import dedup
from animaltrackingetls_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark, copies: int):
    docs = load_table(spark, SF_DIR, "documents")
    frames = [
        docs.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" rep{r}")).alias("text")
            if r
            else F.col("text"),
            "lang",
            "source",
            "n_chars",
        )
        for r in range(copies)
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), frames)


def with_dups(docs):
    clones = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100_000
    )
    return docs.unionByName(clones)


def replicated_embeddings(spark, copies: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    frames = [
        emb.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x + F.lit(0.03 * (r % 5 - 2)) * ((i % 3) - 1),
            ).alias("embedding"),
            "label",
        )
        for r in range(copies)
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), frames)


def fuzzy_dedup_run(docs):
    handles: list = []
    edges = dedup.minhash_candidate_pairs_portable(
        docs, n=2, bands=2, rows_per_band=3, threshold=0.6,
        cache_handles=handles,
    )
    cc = dedup.dedup_clusters(docs, edges)
    keep = cc.filter(F.col("id") == F.col("cluster_id")).count()
    total = cc.count()
    # release the shingle cache per run — six leaked copies across the
    # timed runs would distort the later embedding measurements
    for h in handles:
        h.unpersist()
    return {"clustered": total, "keep_list": keep}


def neardup_run(emb):
    # registered (GEMM) form; the join-form numbers it replaced are kept
    # in SCALING.md's round-6 follow-up table
    pairs = dedup.embedding_neardup_gemm(emb, threshold=0.3)
    return {"pairs": pairs.count()}


def span_run(docs):
    spans = dedup.duplicate_spans(docs, k=5, min_docs=2)
    return {"spans": spans.count()}


def timed(fn, *args):
    outs, times = None, []
    for _ in range(3):
        t0 = time.monotonic()
        outs = fn(*args)
        times.append(time.monotonic() - t0)
    return {**outs, "median_sec": round(statistics.median(times), 2)}


def main() -> None:
    spark = get_spark(
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for copies in (1, 10):
        docs = with_dups(replicated_docs(spark, copies)).cache()
        n_docs = docs.count()
        res = timed(fuzzy_dedup_run, docs)
        print(json.dumps({"pipeline": "fuzzy_dedup", "copies": copies,
                          "docs": n_docs, **res}))
        res = timed(span_run, docs)
        print(json.dumps({"pipeline": "duplicate_spans", "copies": copies,
                          "docs": n_docs, **res}))
        docs.unpersist()
    for copies in (1, 10):
        emb = replicated_embeddings(spark, copies).cache()
        n_vec = emb.count()
        res = timed(neardup_run, emb)
        print(json.dumps({"pipeline": "embedding_neardup", "copies": copies,
                          "vectors": n_vec, **res}))
        emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

"""ANN recall measurement: lsh_topk / ivf_topk vs brute_force_topk.

`lsh_topk` and `ivf_topk` are rows-only in the correctness gate (random
hyperplanes / k-means are not oracle-replayable), so their QUALITY
envelope is pinned here instead: recall@10 against the exact
brute-force neighbors over the sf0.1 embeddings table (2,000×64,
queries = first 50 vec_ids), at the registered query settings plus a
small sweep of the recall knobs (tables / probes). Results feed
SCALING.md; tests/test_similarity.py pins the floor.

    python ann_recall.py
"""
from __future__ import annotations

import json

from pyspark.sql import functions as F

from animaltrackingetls_spark.io import load_table
from animaltrackingetls_spark.operators import similarity
from animaltrackingetls_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.n_id)
    return out


def recall_at_k(approx: dict, exact: dict) -> float:
    total = 0.0
    for q, truth in exact.items():
        got = approx.get(q, set())
        total += len(got & truth) / len(truth)
    return total / len(exact)


def main() -> None:
    spark = get_spark(
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    exact = topk_sets(
        similarity.brute_force_topk(emb, queries, k=K, round_digits=6)
    )

    results = []
    for n_tables in (2, 4, 8):
        approx = topk_sets(
            similarity.lsh_topk(
                emb, queries, k=K, dim=64, n_planes=4, n_tables=n_tables,
                round_digits=6,
            )
        )
        results.append(
            {"algo": "lsh", "n_planes": 4, "n_tables": n_tables,
             "recall_at_10": round(recall_at_k(approx, exact), 4)}
        )
    for n_probe in (1, 2, 4):
        approx = topk_sets(
            similarity.ivf_topk(
                emb, queries, k=K, n_centroids=8, n_probe=n_probe,
                round_digits=6,
            )
        )
        results.append(
            {"algo": "ivf", "n_centroids": 8, "n_probe": n_probe,
             "recall_at_10": round(recall_at_k(approx, exact), 4)}
        )
    # sample-trained centroids (the 100 TB posture): recall at the
    # registered operating point must be within noise of full training
    import time as _time

    for frac in (1.0, 0.25):
        t0 = _time.monotonic()
        approx = topk_sets(
            similarity.ivf_topk(
                emb, queries, k=K, n_centroids=8, n_probe=2,
                round_digits=6, train_fraction=frac,
            )
        )
        results.append(
            {"algo": "ivf", "n_centroids": 8, "n_probe": 2,
             "train_fraction": frac,
             "recall_at_10": round(recall_at_k(approx, exact), 4),
             "wall_sec": round(_time.monotonic() - t0, 2)}
        )
    for r in results:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()

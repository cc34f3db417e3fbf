"""Connected-components strategy experiment: propagation vs star rounds
on long-diameter chain graphs (the adversarial case for min-label
propagation, whose round count equals the graph diameter).

Builds single chains with SHUFFLED node ids (so the min label must
genuinely travel; a monotone chain would let one round finish the job in
the propagate direction) and measures rounds + wall time for:

  * propagate on a diameter-120 chain (rounds ~= diameter)
  * star on the same chain (rounds ~= log2 n)
  * star on 10k-node and 100k-node chains (diameter 9,999 / 99,999 —
    propagation is infeasible there; star stays in single-digit cycles)

Each run validates the labeling: every node must map to the component's
global minimum id. Results feed SCALING.md. Usage:

    python cc_experiment.py
"""
from __future__ import annotations

import json
import random
import time

from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.dedup import connected_components
from animaltrackingetls_spark.session import get_spark


def chain_edges(spark, n_nodes: int, seed: int):
    rng = random.Random(seed)
    ids = list(range(10_000, 10_000 + n_nodes))
    rng.shuffle(ids)
    pairs = [(ids[i], ids[i + 1]) for i in range(n_nodes - 1)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long").cache()
    df.count()
    return df, min(ids)


def run(spark, n_nodes: int, mode: str, max_iter: int) -> dict:
    edges, expect_min = chain_edges(spark, n_nodes, seed=n_nodes)
    stats: dict = {}
    t0 = time.monotonic()
    labels = connected_components(edges, mode=mode, max_iter=max_iter, stats=stats)
    bad = labels.filter(F.col("cluster_id") != F.lit(expect_min)).count()
    n = labels.count()
    elapsed = time.monotonic() - t0
    edges.unpersist()
    return {
        "nodes": n_nodes,
        "diameter": n_nodes - 1,
        "mode": stats["mode"],
        "rounds": stats["rounds"],
        "sec": round(elapsed, 2),
        "labeled": n,
        "mislabeled": bad,
    }


def main() -> None:
    spark = get_spark(
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warmup: spin the JVM + first-shuffle machinery off the clock
    run(spark, 200, "star", 30)

    results = [
        run(spark, 121, "propagate", 200),
        run(spark, 121, "star", 30),
        run(spark, 10_000, "star", 40),
        run(spark, 100_000, "star", 40),
    ]
    for r in results:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()

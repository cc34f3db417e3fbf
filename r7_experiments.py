"""Round-7 measurements.

1. Degenerate-block quadratic guard: one shingle present in 100% of
   documents. Uncapped, the inverted-index join fans out df^2 on that
   shingle (quadratic in corpus size); with ``max_shingle_df`` the
   universal shingle is excluded from candidate generation and the work
   is bounded by cap x shingle rows (linear). Results land in SCALING.md.

Run: python r7_experiments.py degenerate
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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "degenerate"
    s = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    if which == "degenerate":
        degenerate_block(s)

"""Similarity search: brute-force exactness, LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9, 0.1, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_exact(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(vectors, q, k=2).collect()
    assert [(r.n_id, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [(1, 1), (2, 2)]
    top = next(r for r in out if r.rank == 1)
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(top.cosine_sim - expected) < 1e-12


def test_brute_force_excludes_self(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(vectors, q, k=10).collect()
    assert all(r.n_id != 0 for r in out)


def test_lsh_topk_recall_on_clusters(spark):
    # two tight clusters; LSH must recover within-cluster neighbors
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        rows.append((i, [x + rng.gauss(0, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    out = similarity.lsh_topk(df, q, k=5, dim=4, n_planes=2, n_tables=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.n_id)
    # every neighbor of query i must be in query i's parity cluster
    for qid, neigh in by_q.items():
        assert neigh and all(n % 2 == qid % 2 for n in neigh)


def test_ivf_topk_recall_on_clusters(spark):
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        rows.append((i, [x + rng.gauss(0, 0.02) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    out = similarity.ivf_topk(df, q, k=5, n_centroids=4, n_probe=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.n_id)
    assert set(by_q) == {0, 1}
    for qid, neigh in by_q.items():
        assert len(neigh) == 5
        assert all(n % 2 == qid % 2 for n in neigh)  # stays in own cluster


def test_make_cell_ranker_order_ties_and_bounds(spark):
    """The probe ranker must return cells in (squared-L2 asc, cell asc)
    order — the ordering the old window ranked — clamp n_probe to the
    centroid count, and handle empty input."""
    from animaltrackingetls_spark.operators.aggregates import make_cell_ranker

    centers = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.0]),    # nearest: c0, then c1
            (2, [0.5, 0.0]),    # c0 and c1 EQUIDISTANT -> tie to lower index
            (3, [0.9, 0.9]),    # nearest: c3, then c1/c2 tie -> c1
        ],
        "id long, v array<double>",
    )
    ranked = {
        r.id: r.cells
        for r in df.select(
            "id", make_cell_ranker(centers, 3)(F.col("v")).alias("cells")
        ).collect()
    }
    assert ranked[1][:2] == [0, 1]
    assert ranked[2][0] == 0 and set(ranked[2][:2]) == {0, 1}
    assert ranked[3][0] == 3 and ranked[3][1] == 1
    # n_probe beyond the centroid count clamps; below 1 clamps to 1
    full = df.select(make_cell_ranker(centers, 99)(F.col("v")).alias("c")).first().c
    assert sorted(full) == [0, 1, 2, 3]
    one = df.select(make_cell_ranker(centers, 0)(F.col("v")).alias("c")).first().c
    assert len(one) == 1
    empty = spark.createDataFrame([], "id long, v array<double>")
    assert empty.select(make_cell_ranker(centers, 2)(F.col("v"))).count() == 0


def test_ivf_save_load_search_parity_and_partition_pruning(spark, tmp_path):
    """The serving shape: save_ivf_index (assignment partitionBy cell)
    → load_ivf_index → ivf_search(prune_cells=True) must return
    EXACTLY what searching the in-memory index returns, and the
    assignment scan must carry a PartitionFilters entry on cell (the
    probe-bound read the docstring promises)."""
    import random

    rng = random.Random(23)
    rows = []
    for i in range(80):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 0.0, 0.0, 1.0]
        rows.append((i, [x + rng.gauss(0, 0.02) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 3)

    index = similarity.ivf_index(df, n_centroids=4)
    path = str(tmp_path / "ivf_idx")
    similarity.save_ivf_index(index, path)
    loaded = similarity.load_ivf_index(spark, path)
    assert loaded[1] == index[1]  # centroids round-trip exactly

    mem = {
        (r.q_id, r.n_id, r.rank, round(r.cosine_sim, 9))
        for r in similarity.ivf_search(index, q, k=5, n_probe=2).collect()
    }
    served = similarity.ivf_search(loaded, q, k=5, n_probe=2, prune_cells=True)
    got = {
        (r.q_id, r.n_id, r.rank, round(r.cosine_sim, 9))
        for r in served.collect()
    }
    assert got == mem
    # the pruned plan reads only the probed cells' directories
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    import re as _re

    m = _re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*\]", plan)
    assert m, plan


def test_ivf_matches_brute_force_when_probing_all_cells(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)] + [
        (10, [0.7, 0.7, 0.0, 0.0])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 10)
    exact = {(r.n_id, r.rank) for r in similarity.brute_force_topk(df, q, k=3).collect()}
    ivf = {(r.n_id, r.rank) for r in similarity.ivf_topk(
        df, q, k=3, n_centroids=2, n_probe=2).collect()}
    assert ivf == exact  # probing every cell ⇒ identical to exact search


def test_ivf_sample_training_still_exact_when_probing_all(spark):
    """train_fraction changes WHICH cells k-means finds, never the
    candidate completeness when every cell is probed — sampled training
    plus probe-all must still equal brute force. Out-of-range fractions
    are refused."""
    import pytest as _pytest

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)] + [
        (10, [0.7, 0.7, 0.0, 0.0]),
        (11, [0.0, 0.6, 0.6, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 10)
    exact = {(r.n_id, r.rank) for r in similarity.brute_force_topk(df, q, k=3).collect()}
    sampled = {(r.n_id, r.rank) for r in similarity.ivf_topk(
        df, q, k=3, n_centroids=2, n_probe=2, train_fraction=0.6).collect()}
    assert sampled == exact

    with _pytest.raises(ValueError):
        similarity.ivf_topk(df, q, train_fraction=0.0)
    with _pytest.raises(ValueError):
        similarity.ivf_topk(df, q, train_fraction=1.5)


def test_ivf_driver_fit_exact_when_probing_all_and_deterministic(spark):
    """The driver-side k-means++ trainer: probe-all still equals brute
    force (candidate completeness is independent of the trainer), the
    result is deterministic across invocations, and an unknown fit_impl
    is refused."""
    import pytest as _pytest

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)] + [
        (10, [0.7, 0.7, 0.0, 0.0])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 10)
    exact = {(r.n_id, r.rank) for r in similarity.brute_force_topk(df, q, k=3).collect()}
    got1 = {(r.n_id, r.rank) for r in similarity.ivf_topk(
        df, q, k=3, n_centroids=2, n_probe=2, fit_impl="driver").collect()}
    got2 = {(r.n_id, r.rank) for r in similarity.ivf_topk(
        df, q, k=3, n_centroids=2, n_probe=2, fit_impl="driver").collect()}
    assert got1 == exact and got2 == got1

    with _pytest.raises(ValueError):
        similarity.ivf_topk(df, q, fit_impl="sklearn")


def test_ivf_driver_fit_caps_training_sample(spark):
    """max_train_rows caps the driver collect via deterministic md5
    thinning; the full corpus is still assigned to cells (every corpus
    row reachable through probe-all)."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2)
    out = similarity.ivf_topk(
        df, q, k=5, n_centroids=4, n_probe=4, fit_impl="driver",
        max_train_rows=50,
    )
    exact = similarity.brute_force_topk(df, q, k=5)
    assert {(r.q_id, r.n_id, r.rank) for r in out.collect()} == {
        (r.q_id, r.n_id, r.rank) for r in exact.collect()
    }


def test_round_digits_rounds_similarity(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(vectors, q, k=1, round_digits=2).collect()
    sim = out[0].cosine_sim
    assert sim == round(sim, 2) and sim == 0.99  # 0.9/sqrt(0.82) ≈ 0.9939 → 0.99


def test_numpy_bucket_assigner_matches_jvm_expression(spark):
    # The Arrow/numpy GEMM assigner (the fast path inside lsh_topk) and
    # the pure-JVM sign-bit expression must agree bucket-for-bucket —
    # pairwise-summed GEMM dots vs sequential fold dots may differ in
    # ulps, and a silent divergence would desync probe and index sides.
    import random

    from animaltrackingetls_spark.operators.aggregates import make_bucket_assigner
    from animaltrackingetls_spark.operators.similarity import (
        _bucket_expr,
        _hyperplanes,
    )

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tables = [_hyperplanes(16, 6, seed=42 + 1000 * t) for t in range(2)]

    assigner = make_bucket_assigner(tables)
    via_numpy = {
        (r.vec_id, r.t): r.b
        for t in range(2)
        for r in df.select(
            "vec_id",
            F.lit(t).alias("t"),
            F.get(assigner(F.col("embedding")), t).alias("b"),
        ).collect()
    }
    via_jvm = {
        (r.vec_id, r.t): r.b
        for t, planes in enumerate(tables)
        for r in df.select(
            "vec_id",
            F.lit(t).alias("t"),
            _bucket_expr(F.col("embedding"), planes).alias("b"),
        ).collect()
    }
    assert via_numpy == via_jvm


def test_ann_recall_floor_on_real_embeddings(spark):
    """Pin the ANN quality envelope measured in SCALING.md: on the real
    sf0.01 embeddings table (regenerated by the driver each round, so
    floors carry margin below the measured 0.876 / 0.54), LSH at the
    documented >=0.9-at-sf0.1 settings (4 planes x 16 tables) must keep
    recall@10 >= 0.75, and IVF at its efficiency point (8 cells, probe
    2 — ~25% candidate fraction) >= 0.40 vs exact brute force."""
    from animaltrackingetls_spark.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 25)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.q_id, set()).add(r.n_id)
        return out

    def recall(approx, exact):
        return sum(
            len(approx.get(q, set()) & t) / len(t) for q, t in exact.items()
        ) / len(exact)

    exact = topk_sets(similarity.brute_force_topk(emb, queries, k=10, round_digits=6))
    lsh = topk_sets(
        similarity.lsh_topk(
            emb, queries, k=10, dim=64, n_planes=4, n_tables=16, round_digits=6
        )
    )
    ivf = topk_sets(
        similarity.ivf_topk(
            emb, queries, k=10, n_centroids=8, n_probe=2, round_digits=6
        )
    )
    assert recall(lsh, exact) >= 0.75
    assert recall(ivf, exact) >= 0.40
    # the >=0.9 operating point registered as the second ivf_topk
    # branch: probe 6 of 8 cells measured 0.96 here (round 7); floor
    # carries margin for driver-regenerated embeddings
    ivf6 = topk_sets(
        similarity.ivf_topk(
            emb, queries, k=10, n_centroids=8, n_probe=6, round_digits=6
        )
    )
    assert recall(ivf6, exact) >= 0.80
    emb.unpersist()


def test_ivf_exact_over_candidates(spark):
    """IVF's guarantee decomposition: scores/ranks are EXACT within the
    probed candidate set — approximation enters only through which cells
    are probed. For each query, ivf_topk's result must equal brute-force
    top-k restricted to that query's candidate set (recomputed
    independently here from the same centroids + probe rule)."""
    import numpy as np

    from animaltrackingetls_spark.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10)
    got = {}
    for r in similarity.ivf_topk(
        emb, queries, k=10, n_centroids=8, n_probe=2, round_digits=6
    ).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.n_id, r.cosine_sim))

    # independent reconstruction: same trainer, same seed -> same cells
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    full = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("features", array_to_vector(F.col("v")))
    model = KMeans(k=8, seed=42, maxIter=8, featuresCol="features").fit(full)
    cells = {
        r.vec_id: r.prediction for r in model.transform(full).collect()
    }
    centers = [np.asarray(c) for c in model.clusterCenters()]
    vecs = {r.vec_id: np.asarray(r.v) for r in full.select("vec_id", "v").collect()}
    for q_id, rows in got.items():
        qv = vecs[q_id]
        probe = sorted(
            range(8), key=lambda ci: (float(((qv - centers[ci]) ** 2).sum()), ci)
        )[:2]
        cand = [
            i for i, c in cells.items() if c in probe and i != q_id
        ]
        sims = sorted(
            (
                (
                    round(
                        float(
                            vecs[i] @ qv
                            / (np.linalg.norm(vecs[i]) * np.linalg.norm(qv))
                        ),
                        6,
                    ),
                    i,
                )
                for i in cand
            ),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        expect = [(r + 1, i, s) for r, (s, i) in enumerate(sims)]
        assert sorted(rows) == expect, f"q_id={q_id}"
    emb.unpersist()


def test_quantize_int8_formula_and_bounds(spark):
    from animaltrackingetls_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5, 0.0]), (2, [0.25, -0.5, 2.0, -2.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: (r.qvec, r.scale) for r in quantize_embeddings_int8(df).collect()}
    # global scale = max |x| = 2.0; q = floor(x*127/2 + 0.5) clamped
    assert out[1][1] == 2.0
    assert out[1][0] == [64, -63, 32, 0]  # floor(63.5+0.5)=64, floor(-63.5+0.5)=-63
    assert out[2][0] == [16, -32, 127, -127]  # floor(-31.75+0.5) = -32
    # explicit tiny scale clamps to the int8 envelope
    from animaltrackingetls_spark.operators.similarity import (
        quantize_embeddings_int8 as q8,
    )
    clamped = q8(df, scale=0.1).collect()
    flat = [v for r in clamped for v in r.qvec]
    assert max(flat) == 127 and min(flat) == -127


def test_quantized_topk_recall_floor_on_real_embeddings(spark):
    """Int8 top-10 vs exact double top-10 on the sf0.001 embeddings:
    recall must stay ≥ 0.9 — the measured cost of 8x fewer wire bytes."""
    from animaltrackingetls_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_quantized,
        quantize_embeddings_int8,
    )
    from animaltrackingetls_spark.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=10)
    qz = quantize_embeddings_int8(emb)
    qq = qz.filter(F.col("vec_id") < 8)
    quant = brute_force_topk_quantized(qz, qq, k=10)
    ex = {(r.q_id, r.n_id) for r in exact.collect()}
    qt = {(r.q_id, r.n_id) for r in quant.collect()}
    assert len(ex) == len(qt) > 0
    recall = len(ex & qt) / len(ex)
    assert recall >= 0.9, recall


def test_quantize_int8_null_vector_passthrough(spark):
    from animaltrackingetls_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5]), (2, None)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r.qvec for r in quantize_embeddings_int8(df).collect()}
    assert out[2] is None and out[1] is not None


def test_quantize_int8_all_zero_corpus_fails_loud(spark):
    from animaltrackingetls_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    with _pytest.raises(SparkRuntimeException, match="computed scale"):
        quantize_embeddings_int8(df).collect()


def test_ivf_append_parity_with_rebuilt_index_and_staleness(spark, tmp_path):
    """Incremental maintenance: append a same-distribution batch to a
    saved index; searching the appended index (probing all cells, where
    IVF is exact over the indexed set) must equal searching a REBUILT
    index over the union — and the staleness ratio must read ~1 for
    in-distribution data. Stats sidecar merges counts."""
    import random

    rng = random.Random(31)

    def cluster_rows(ids, base):
        return [
            (i, [x + rng.gauss(0, 0.02) for x in base]) for i in ids
        ]

    a_rows = cluster_rows(range(30), [1.0, 0.0, 0.0, 0.0]) + cluster_rows(
        range(30, 60), [0.0, 0.0, 0.0, 1.0]
    )
    b_rows = cluster_rows(range(100, 110), [1.0, 0.0, 0.0, 0.0]) + (
        cluster_rows(range(110, 120), [0.0, 0.0, 0.0, 1.0])
    )
    schema = "vec_id long, embedding array<double>"
    dfa = spark.createDataFrame(a_rows, schema)
    dfb = spark.createDataFrame(b_rows, schema)

    path = str(tmp_path / "ivf_grow")
    similarity.save_ivf_index(similarity.ivf_index(dfa, n_centroids=4), path)

    out = similarity.ivf_append(spark, path, dfb)
    assert out["n_appended"] == 20
    assert 0.5 < out["staleness_ratio"] < 2.0  # in-distribution

    q = dfa.filter(F.col("vec_id") < 3)
    loaded = similarity.load_ivf_index(spark, path)
    got = {
        (r.q_id, r.n_id, r.rank)
        for r in similarity.ivf_search(
            loaded, q, k=5, n_probe=4, prune_cells=True
        ).collect()
    }
    # rebuilt-from-scratch index over the union, same probe budget
    rebuilt = similarity.ivf_index(dfa.unionByName(dfb), n_centroids=4)
    want = {
        (r.q_id, r.n_id, r.rank)
        for r in similarity.ivf_search(rebuilt, q, k=5, n_probe=4).collect()
    }
    assert got == want

    stats = spark.read.parquet(f"{path}/stats")
    assert stats.agg(F.sum("n")).first()[0] == 80


def test_ivf_append_staleness_guard_dim_check_and_stats_backfill(
    spark, tmp_path
):
    """Out-of-distribution batches trip the max_staleness_ratio guard
    BEFORE anything is written; dimension mismatches raise; a round-8
    layout without the stats sidecar gets its baseline backfilled from
    the existing assignment on first append."""
    import shutil

    rows = [(i, [float(i % 2), 1.0 - (i % 2), 0.0, 0.0]) for i in range(40)]
    schema = "vec_id long, embedding array<double>"
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "ivf_guard")
    similarity.save_ivf_index(similarity.ivf_index(df, n_centroids=2), path)
    n0 = spark.read.parquet(f"{path}/assignment").count()

    far = spark.createDataFrame(
        [(200 + i, [100.0, -100.0, 100.0, -100.0]) for i in range(5)], schema
    )
    with pytest.raises(RuntimeError, match="staleness ratio"):
        similarity.ivf_append(spark, path, far, max_staleness_ratio=3.0)
    assert spark.read.parquet(f"{path}/assignment").count() == n0  # no write

    wrong_dim = spark.createDataFrame([(300, [1.0, 2.0])], schema)
    with pytest.raises(ValueError, match="dim"):
        similarity.ivf_append(spark, path, wrong_dim)

    # stats backfill: blow away the sidecar, append, sidecar restored
    shutil.rmtree(f"{path}/stats")
    batch = spark.createDataFrame([(400, [1.0, 0.0, 0.0, 0.0])], schema)
    out = similarity.ivf_append(spark, path, batch)
    assert out["n_appended"] == 1 and out["staleness_ratio"] is not None
    assert spark.read.parquet(f"{path}/stats").agg(F.sum("n")).first()[0] == 41


def test_ivf_compact_merges_small_files_without_changing_results(
    spark, tmp_path
):
    """Three appends leave 1+3 files in each written cell; compaction
    rewrites ONLY fragmented cells down to one file each, leaves
    below-threshold cells' files untouched (same physical file names),
    and search results are identical before and after."""
    import os

    schema = "vec_id long, embedding array<double>"

    def mk(ids, base):
        return spark.createDataFrame(
            [(i, [base, 1.0 - base, 0.0, 0.0]) for i in ids], schema
        )

    path = str(tmp_path / "ivf_frag")
    # two clear clusters -> 2 cells; all appends hit both cells
    build = mk(range(20), 1.0).unionByName(mk(range(20, 40), 0.0))
    similarity.save_ivf_index(similarity.ivf_index(build, n_centroids=2), path)
    for j in range(3):
        batch = mk([100 + j], 1.0).unionByName(mk([200 + j], 0.0))
        similarity.ivf_append(spark, path, batch)

    def files_per_cell():
        out = {}
        for d in os.listdir(f"{path}/assignment"):
            if d.startswith("cell="):
                out[d] = sorted(
                    f
                    for f in os.listdir(f"{path}/assignment/{d}")
                    if not f.startswith(("_", "."))
                )
        return out

    before = files_per_cell()
    # build + 3 appends: every cell is fragmented (file count per cell
    # is task-layout-dependent, but each append adds at least one)
    assert all(len(v) >= 4 for v in before.values())
    n_before = sum(len(v) for v in before.values())

    q = mk([0], 1.0).unionByName(mk([20], 0.0))
    def run_search():
        idx = similarity.load_ivf_index(spark, path)
        return {
            (r.q_id, r.n_id, r.rank)
            for r in similarity.ivf_search(
                idx, q, k=5, n_probe=2, prune_cells=True
            ).collect()
        }

    want = run_search()

    # a high threshold: nothing fragmented enough -> no-op, no files touched
    out0 = similarity.ivf_compact(spark, path, max_files_per_cell=n_before)
    assert out0 == {"cells_compacted": 0, "files_before": 0, "files_after": 0}
    assert files_per_cell() == before

    out = similarity.ivf_compact(spark, path, max_files_per_cell=2)
    assert out["cells_compacted"] == 2
    assert out["files_before"] == n_before and out["files_after"] == 2
    after = files_per_cell()
    assert all(len(v) == 1 for v in after.values())
    assert run_search() == want
    # appended index still holds every row
    assert spark.read.parquet(f"{path}/assignment").count() == 46

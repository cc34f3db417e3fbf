"""IVF-PQ composition: coarse cells × PQ residuals (operators/ivfpq.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.ivfpq import (
    ivfpq_build,
    ivfpq_search,
    load_ivfpq_meta,
)

DIM = 16


def _clustered(n, n_centers=8, dim=DIM, seed=5, spread=0.05):
    rng = random.Random(seed)
    centers = [[rng.random() for _ in range(dim)] for _ in range(n_centers)]
    return [
        (i, [x + rng.uniform(-spread, spread)
             for x in centers[i % n_centers]])
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def rows():
    return _clustered(600)


@pytest.fixture(scope="module")
def corpus(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4).localCheckpoint()


@pytest.fixture(scope="module")
def index_path(corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ivfpq_build(
        corpus, path, dim=DIM, n_cells=8, m=4, nbits=8, seed=7,
        max_train_rows=600,
    )
    return path


def _exact_topk(rows, q, k):
    def l2(v):
        return sum((a - b) ** 2 for a, b in zip(v, q))

    return [i for i, v in sorted(rows, key=lambda r: (l2(r[1]), r[0]))[:k]]


def test_meta_sidecar(index_path):
    meta = load_ivfpq_meta(index_path)
    assert (meta["dim"], meta["n_cells"], meta["m"], meta["nbits"]) == (
        DIM, 8, 4, 8,
    )
    assert meta["residual"] is True
    assert len(meta["centers"]) == 8 and len(meta["centers"][0]) == DIM
    assert len(meta["books"]) == 4 and len(meta["books"][0]) == 256


def test_layout_is_cell_partitioned(spark, index_path):
    df = spark.read.parquet(f"{index_path}/codes")
    assert set(df.columns) == {"n_id", "pq_code", "cell"}
    assert dict(df.dtypes)["pq_code"] == "bigint"
    n_cells = df.select("cell").distinct().count()
    assert 1 < n_cells <= 8
    assert df.count() == 600


def test_search_recall_on_clustered_corpus(spark, rows, index_path):
    """Probing all 8 cells = plain PQ-over-residuals: near-exact on
    this fixture. Probing 2 still recovers most of the top-10 because
    near neighbors share the query's cells."""
    rng = random.Random(3)
    data = dict(rows)
    qids = rng.sample(sorted(data), 8)
    hits_full = hits_2 = 0
    for qid in qids:
        q = data[qid]
        want = set(_exact_topk(rows, q, 10))
        got_full = {
            r["vec_id"]
            for r in ivfpq_search(spark, index_path, q, k=10, n_probe=8).collect()
        }
        got_2 = {
            r["vec_id"]
            for r in ivfpq_search(spark, index_path, q, k=10, n_probe=2).collect()
        }
        hits_full += len(got_full & want)
        hits_2 += len(got_2 & want)
    # measured on this fixture at m=4/nbits=8: full-probe 0.89 and
    # 2-probe 0.89 (tight clusters: the 2 nearest cells already hold
    # every true neighbor, so extra probes add candidates, not recall)
    assert hits_full / 80 >= 0.80, f"full-probe recall {hits_full/80:.2f}"
    assert hits_2 / 80 >= 0.70, f"2-probe recall {hits_2/80:.2f}"
    assert hits_full >= hits_2


def test_residual_dominates_raw_encoding(spark, corpus, rows, tmp_path):
    """The reason IVF-PQ encodes residuals: same m/nbits budget, the
    residual index recalls at least as well as the raw-vector index
    (strictly better on this fixture at nbits=4, where codebook
    budget is scarcest: measured 0.61 vs 0.41 full-probe)."""
    raw_path = str(tmp_path / "raw_idx")
    ivfpq_build(
        corpus, raw_path, dim=DIM, n_cells=8, m=4, nbits=4, seed=7,
        max_train_rows=600, residual=False,
    )
    res_path = str(tmp_path / "res_idx")
    ivfpq_build(
        corpus, res_path, dim=DIM, n_cells=8, m=4, nbits=4, seed=7,
        max_train_rows=600, residual=True,
    )
    rng = random.Random(3)
    data = dict(rows)
    qids = rng.sample(sorted(data), 8)
    h_res = h_raw = 0
    for qid in qids:
        q = data[qid]
        want = set(_exact_topk(rows, q, 10))
        h_res += len(
            {r["vec_id"] for r in
             ivfpq_search(spark, res_path, q, k=10, n_probe=8).collect()}
            & want
        )
        h_raw += len(
            {r["vec_id"] for r in
             ivfpq_search(spark, raw_path, q, k=10, n_probe=8).collect()}
            & want
        )
    assert h_res > h_raw, f"residual {h_res} <= raw {h_raw}"
    assert h_res / 80 >= 0.50


def test_search_plan_prunes_partitions(spark, index_path, rows):
    """The static cell IN-list must reach the scan as PartitionFilters
    — the probed directories are the only ones read."""
    q = dict(rows)[0]
    df = ivfpq_search(spark, index_path, q, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_search_is_deterministic_and_sorted(spark, index_path, rows):
    q = dict(rows)[7]
    a = ivfpq_search(spark, index_path, q, k=10, n_probe=3).collect()
    b = ivfpq_search(spark, index_path, q, k=10, n_probe=3).collect()
    assert [(r["vec_id"], r["pq_score"]) for r in a] == [
        (r["vec_id"], r["pq_score"]) for r in b
    ]
    scores = [r["pq_score"] for r in a]
    assert scores == sorted(scores)
    # the query IS corpus row 7 — its own quantized residual must land
    # it in the top-10 (exact rank can swap with near-ties under ADC)
    assert 7 in {r["vec_id"] for r in a}


def test_build_validates(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="must divide"):
        ivfpq_build(corpus, str(tmp_path / "x"), dim=DIM, m=3)
    with pytest.raises(ValueError, match="long-packed"):
        ivfpq_build(corpus, str(tmp_path / "x"), dim=18, m=9)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        ivfpq_build(empty, str(tmp_path / "x"), dim=DIM, m=4)
    with pytest.raises(ValueError, match="smaller"):
        ivfpq_build(
            corpus.limit(4), str(tmp_path / "x"), dim=DIM, n_cells=8, m=4,
            nbits=4, max_train_rows=4,
        )


def test_search_validates(spark, index_path):
    with pytest.raises(ValueError, match="k must be"):
        ivfpq_search(spark, index_path, [0.0] * DIM, k=0)
    with pytest.raises(ValueError, match="dims"):
        ivfpq_search(spark, index_path, [0.0] * (DIM + 1), k=3)


def test_corrupt_meta_raises(tmp_path):
    import json
    import os

    path = str(tmp_path / "bad")
    os.makedirs(path)
    with open(f"{path}/meta.json", "w") as f:
        json.dump({"dim": 4}, f)
    with pytest.raises(ValueError, match="missing"):
        load_ivfpq_meta(path)


def test_null_vectors_dropped_at_build(spark, tmp_path):
    rows = _clustered(120, n_centers=4)
    df = spark.createDataFrame(
        rows + [(999, None)], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "nulls")
    ivfpq_build(df, path, dim=DIM, n_cells=4, m=4, nbits=4,
                max_train_rows=200)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == 120
    assert codes.filter(F.col("n_id") == 999).count() == 0


# ---------------------------------------------------------------------------
# Frozen-index DuckDB oracle: the two k-means fits keep the ivfpq_topk
# driver query rows-only, but SEARCH over a fixed index — coarse-cell
# ranking, n_probe pruning, per-cell residual LUTs, packed-byte
# extraction, LUT-sum ranking — is pure arithmetic. A hand-written
# index (literal centers, literal books, literal codes partitioned by
# cell) pins ivfpq_search against a DuckDB replay of the same math.
# ---------------------------------------------------------------------------

_FZI_CENTERS = [
    [0.0, 0.0, 0.0, 0.0],
    [1.0, 1.0, -1.0, 0.5],
    [-1.0, 0.5, 1.0, -0.5],
]
_FZI_BOOKS = [
    [[0.10, 0.25], [0.90, -0.40], [-0.35, 0.55], [0.70, 0.70]],
    [[-0.20, 0.15], [0.45, 0.80], [0.05, -0.65], [-0.90, -0.10]],
]
# (n_id, cell, b0, b1) — codes chosen to cover every byte value and to
# spread ids across all three cells (cell 1 is the pruned one below)
_FZI_CODES = [
    (0, 0, 0, 1), (1, 0, 1, 2), (2, 0, 2, 3), (3, 0, 3, 0),
    (4, 1, 0, 0), (5, 1, 2, 1),
    (6, 2, 1, 3), (7, 2, 3, 2), (8, 2, 0, 2), (9, 2, 2, 0),
]
_FZI_Q = [-0.40, 0.30, 0.45, -0.20]  # nearest cells: 0 and 2 (prunes 1)


def _frozen_index(spark, tmp_path) -> str:
    import json
    import os

    path = str(tmp_path / "fzi")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        json.dump({
            "dim": 4, "n_cells": 3, "m": 2, "nbits": 2, "seed": 0,
            "residual": True, "metric": "l2",
            "centers": _FZI_CENTERS, "books": _FZI_BOOKS,
        }, f)
    rows = [(nid, cell, b0 * 256 + b1) for nid, cell, b0, b1 in _FZI_CODES]
    spark.createDataFrame(
        rows, "n_id long, cell int, pq_code long"
    ).repartition(3, "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/codes")
    return path


def _fzi_duck_sql(k: int) -> str:
    """DuckDB replay from the same literals: rank cells by
    ||c||² − 2 c·q (stable argsort), keep the 2 nearest, score each
    surviving code with the LUT of its cell's query residual."""
    code_rows = ", ".join(
        f"({nid}, {cell}, {b0}, {b1})" for nid, cell, b0, b1 in _FZI_CODES
    )

    def cell_d2(c):
        cc = " + ".join(f"{x!r}*{x!r}" for x in c)
        dot = " + ".join(f"{x!r}*{q!r}" for x, q in zip(c, _FZI_Q))
        return f"(({cc}) - 2.0*({dot}))"

    cells_ranked = ", ".join(
        f"({i}, {cell_d2(c)})" for i, c in enumerate(_FZI_CENTERS)
    )

    def lut(cell_idx, j):
        # residual LUT: plain PQ table of (q - center) for this cell
        vals = []
        for c in _FZI_BOOKS[j]:
            r0 = f"({_FZI_Q[2 * j]!r} - {_FZI_CENTERS[cell_idx][2 * j]!r})"
            r1 = f"({_FZI_Q[2 * j + 1]!r} - {_FZI_CENTERS[cell_idx][2 * j + 1]!r})"
            vals.append(
                f"(({c[0]!r} - {r0})*({c[0]!r} - {r0})"
                f" + ({c[1]!r} - {r1})*({c[1]!r} - {r1}))"
            )
        return f"[{', '.join(vals)}]"

    score_cases = " ".join(
        f"WHEN cell = {ci} THEN ({lut(ci, 0)}[b0 + 1] + {lut(ci, 1)}[b1 + 1])"
        for ci in range(len(_FZI_CENTERS))
    )
    return f"""
        WITH ranked AS (
          SELECT cell FROM (VALUES {cells_ranked}) AS t(cell, d2)
          ORDER BY d2, cell LIMIT 2
        ),
        codes(n_id, cell, b0, b1) AS (VALUES {code_rows})
        SELECT n_id AS vec_id,
               CASE {score_cases} END AS pq_score
        FROM codes WHERE cell IN (SELECT cell FROM ranked)
        ORDER BY pq_score, vec_id
        LIMIT {k}
    """


def test_frozen_index_search_matches_duckdb(spark, tmp_path):
    import duckdb

    path = _frozen_index(spark, tmp_path)
    got = [
        (r["vec_id"], r["pq_score"])
        for r in ivfpq_search(spark, path, _FZI_Q, k=6, n_probe=2).collect()
    ]
    want = [
        (int(r[0]), float(r[1]))
        for r in duckdb.sql(_fzi_duck_sql(k=6)).fetchall()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15)
    # the pruned cell's ids (cell 1 = farthest from the query) never
    # appear even when k exceeds the surviving candidate count
    pruned = {nid for nid, cell, _, _ in _FZI_CODES if cell == 1}
    assert pruned.isdisjoint({g[0] for g in got})


def test_search_rerank_restores_exact_order(spark, corpus, rows, index_path):
    from animaltrackingetls_spark.operators.ivfpq import ivfpq_search_rerank

    q = rows[3][1]
    exact = _exact_topk(rows, q, 10)
    adc = [
        r["vec_id"]
        for r in ivfpq_search(spark, index_path, q, k=10, n_probe=4).collect()
    ]
    rr = ivfpq_search_rerank(
        spark, index_path, corpus, q, k=10, n_probe=4, oversample=5
    ).collect()
    rr_ids = [r["vec_id"] for r in rr]
    # rerank recall can only match-or-beat raw ADC recall
    r_adc = len(set(adc) & set(exact)) / 10
    r_rr = len(set(rr_ids) & set(exact)) / 10
    assert r_rr >= r_adc
    # scores are EXACT L2 and ascending
    import numpy as np

    vec = {i: v for i, v in rows}
    for r in rr:
        want = float(np.sum((np.asarray(vec[r["vec_id"]]) - np.asarray(q)) ** 2))
        assert abs(r["exact_score"] - want) < 1e-9
    assert [r["exact_score"] for r in rr] == sorted(
        r["exact_score"] for r in rr
    )
    # guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="oversample"):
        ivfpq_search_rerank(spark, index_path, corpus, q, oversample=0)
    with _pytest.raises(ValueError, match="corpus lacks"):
        ivfpq_search_rerank(
            spark, index_path, corpus.withColumnRenamed("embedding", "e"), q
        )

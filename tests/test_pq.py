"""Product quantization: train/encode/ADC-search (operators/pq.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.pq import (
    pq_topk_rerank,
    PQCodebooks,
    pq_encode,
    pq_topk,
    pq_train,
)

DIM = 16


def _clustered(n, n_centers=8, dim=DIM, seed=5, spread=0.05):
    """Deterministic clustered vectors: points around unit-cube centers."""
    rng = random.Random(seed)
    centers = [[rng.random() for _ in range(dim)] for _ in range(n_centers)]
    rows = []
    for i in range(n):
        c = centers[i % n_centers]
        rows.append(
            (i, [x + rng.uniform(-spread, spread) for x in c])
        )
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        _clustered(600), "vec_id long, embedding array<double>"
    ).repartition(4).localCheckpoint()
    return df


@pytest.fixture(scope="module")
def books(corpus):
    return pq_train(corpus, dim=DIM, m=4, nbits=4, seed=7, max_train_rows=600)


def test_train_shapes_and_determinism(corpus, books):
    assert (books.m, books.k, books.dim, books.dsub) == (4, 16, DIM, 4)
    assert len(books.books) == 4
    assert all(len(b) == 16 and len(b[0]) == 4 for b in books.books)
    again = pq_train(corpus, dim=DIM, m=4, nbits=4, seed=7, max_train_rows=600)
    assert again.books == books.books  # same seed -> bit-identical


def test_train_validates(corpus):
    with pytest.raises(ValueError, match="must divide"):
        pq_train(corpus, dim=DIM, m=3)
    with pytest.raises(ValueError, match="nbits"):
        pq_train(corpus, dim=DIM, m=4, nbits=9)
    with pytest.raises(ValueError, match="metric"):
        pq_train(corpus, dim=DIM, m=4, metric="cosine")
    with pytest.raises(ValueError, match="smaller than"):
        pq_train(corpus.limit(5), dim=DIM, m=4, nbits=8, max_train_rows=5)


def test_encode_emits_m_bytes_and_propagates_null(spark, corpus, books):
    enc = pq_encode(corpus, books)
    row = enc.select(F.length("pq_code").alias("n")).distinct().collect()
    assert [r["n"] for r in row] == [4]
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    out = pq_encode(nulls, books).collect()[0]
    assert out["pq_code"] is None


def test_encode_centroid_roundtrip(spark, books):
    """A vector assembled FROM subspace centroids encodes to exactly
    those centroid ids (zero quantization error)."""
    codes = [3, 0, 7, 12]
    vec = []
    for j, c in enumerate(codes):
        vec.extend(books.books[j][c])
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    got = pq_encode(df, books).collect()[0]["pq_code"]
    assert list(got) == codes


def test_adc_exact_when_error_is_zero(spark, books):
    """If every corpus vector IS a centroid tuple, ADC distances are
    EXACT, so pq_topk must equal full-precision brute force."""
    rng = random.Random(11)
    rows = []
    for i in range(80):
        vec = []
        for j in range(books.m):
            vec.extend(books.books[j][rng.randrange(books.k)])
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = pq_encode(df, books).localCheckpoint()
    q = rows[17][1]
    got = [r["vec_id"] for r in pq_topk(enc, books, q, k=5).collect()]
    # exact L2 reference on the driver
    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))
    want = [i for i, _ in sorted(rows, key=lambda r: (l2(r[1], q), r[0]))[:5]]
    assert got == want
    assert got[0] == 17  # the query itself is in the corpus


def _exact_top10(data, q):
    def l2(a):
        return sum((x - y) ** 2 for x, y in zip(a, q))

    return {i for i, _ in sorted(data.items(), key=lambda kv: (l2(kv[1]), kv[0]))[:10]}


def test_recall_tradeoff_on_clustered_corpus(spark, corpus, books):
    """The measured PQ trade-off, pinned with margin (measured on this
    fixture: plain recall@10 = 0.44 at nbits=4 / 0.85 at nbits=8;
    exact-top10-inside-ADC-top50 = 0.93 at nbits=4). Tight clusters are
    PQ's WORST case — within-cluster distances sit below quantization
    error — which is exactly why pq_topk_rerank exists."""
    data = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    rng = random.Random(3)
    qids = rng.sample(sorted(data), 8)

    # nbits=4 shortlist: weak as a ranker, strong as a candidate filter
    enc4 = pq_encode(corpus, books).localCheckpoint()
    short_hits = 0
    for qid in qids:
        q = data[qid]
        a50 = {r["vec_id"] for r in pq_topk(enc4, books, q, k=50).collect()}
        short_hits += len(a50 & _exact_top10(data, q))
    assert short_hits / 80 >= 0.85, f"shortlist coverage = {short_hits/80:.2f}"

    # nbits=8: one byte per subspace, usable as a direct ranker
    books8 = pq_train(corpus, dim=DIM, m=4, nbits=8, seed=7, max_train_rows=600)
    enc8 = pq_encode(corpus, books8).localCheckpoint()
    hits = 0
    for qid in qids:
        q = data[qid]
        a10 = {r["vec_id"] for r in pq_topk(enc8, books8, q, k=10).collect()}
        hits += len(a10 & _exact_top10(data, q))
    assert hits / 80 >= 0.75, f"recall@10 = {hits/80:.2f}"


def test_rerank_recovers_exact_quality(spark, corpus, books):
    """pq_topk_rerank: ADC shortlist + exact rerank on candidates only
    — even the weak nbits=4 codes reach near-exact top-10."""
    enc = pq_encode(corpus, books).localCheckpoint()
    data = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    rng = random.Random(3)
    qids = rng.sample(sorted(data), 8)
    hits = 0
    for qid in qids:
        q = data[qid]
        got = {
            r["vec_id"]
            for r in pq_topk_rerank(enc, books, q, k=10, oversample=5).collect()
        }
        hits += len(got & _exact_top10(data, q))
    # rerank recall == shortlist coverage by construction (exact metric
    # on candidates); measured 0.93 on this fixture
    assert hits / 80 >= 0.85, f"rerank recall@10 = {hits/80:.2f}"


def test_rerank_validates(corpus, books):
    enc = pq_encode(corpus, books)
    with pytest.raises(ValueError, match="oversample"):
        pq_topk_rerank(enc, books, [0.0] * DIM, k=3, oversample=0)


def test_ip_metric_orders_descending(spark, corpus):
    books_ip = pq_train(
        corpus, dim=DIM, m=4, nbits=4, seed=7, metric="ip", max_train_rows=600
    )
    enc = pq_encode(corpus, books_ip).localCheckpoint()
    q = [1.0] * DIM
    rows = pq_topk(enc, books_ip, q, k=5, code_col="pq_code").collect()
    scores = [r["pq_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_topk_validates(corpus, books):
    enc = pq_encode(corpus, books)
    with pytest.raises(ValueError, match="k must be"):
        pq_topk(enc, books, [0.0] * DIM, k=0)
    with pytest.raises(ValueError, match="dims"):
        pq_topk(enc, books, [0.0] * (DIM - 1), k=3)


def test_compression_ratio_claim(books):
    """The storage claim in the module docstring, kept honest: an
    m-byte code vs dim float64s."""
    raw = DIM * 8
    assert raw / books.m == 32.0

"""Product quantization: train/encode/ADC-search (operators/pq.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators.pq import (
    pq_topk_rerank,
    PQCodebooks,
    pq_adc_score_expr,
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


def test_encode_emits_code_and_propagates_null(spark, corpus, books):
    enc_b = pq_encode(corpus, books, layout="binary")
    row = enc_b.select(F.length("pq_code").alias("n")).distinct().collect()
    assert [r["n"] for r in row] == [4]
    assert dict(pq_encode(corpus, books).dtypes)["pq_code"] == "bigint"
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    for layout in ("long", "binary"):
        out = pq_encode(nulls, books, layout=layout).collect()[0]
        assert out["pq_code"] is None
    with pytest.raises(ValueError, match="layout"):
        pq_encode(corpus, books, layout="short")
    big = PQCodebooks(m=9, k=2, dim=18, metric="l2",
                      books=[[[0.0, 0.0]] * 2] * 9)
    with pytest.raises(ValueError, match="64 bits"):
        pq_encode(corpus, big, layout="long")


def test_encode_centroid_roundtrip(spark, books):
    """A vector assembled FROM subspace centroids encodes to exactly
    those centroid ids (zero quantization error) — and the packed-long
    layout holds the same bytes big-endian."""
    codes = [3, 0, 7, 12]
    vec = []
    for j, c in enumerate(codes):
        vec.extend(books.books[j][c])
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    got = pq_encode(df, books, layout="binary").collect()[0]["pq_code"]
    assert list(got) == codes
    packed = pq_encode(df, books, layout="long").collect()[0]["pq_code"]
    assert packed == int.from_bytes(bytes(codes), "big", signed=True)


def test_long_layout_high_bit_roundtrip(spark):
    """m=8 codes whose FIRST byte has the high bit set exceed Long.MAX
    unsigned — the two's-complement pack plus unsigned-shift unpack
    must still round-trip and score identically to the binary layout."""
    from animaltrackingetls_spark.operators.pq import pq_adc_score_expr

    dim, m, k = 16, 8, 2
    # book j, centroid 1 is far from origin so a big vector picks id 1
    books = PQCodebooks(
        m=m, k=k, dim=dim, metric="l2",
        books=[[[0.0, 0.0], [10.0 + j, 10.0 + j]] for j in range(m)],
    )
    df = spark.createDataFrame(
        [(0, [10.0] * dim), (1, [0.0] * dim)],
        "vec_id long, embedding array<double>",
    )
    packed = {r["vec_id"]: r["pq_code"]
              for r in pq_encode(df, books, layout="long").collect()}
    assert packed[0] == int.from_bytes(bytes([1] * m), "big", signed=True)
    assert packed[1] == 0
    # byte 0 >= 0x80 -> negative packed long; with full k=256 books the
    # scores must match the binary layout bit for bit (expr AND arrow)
    rng = random.Random(9)
    books256 = PQCodebooks(
        m=m, k=256, dim=dim, metric="l2",
        books=[
            [[rng.uniform(-1, 1), rng.uniform(-1, 1)] for _ in range(256)]
            for _ in range(m)
        ],
    )
    bpat = bytes([0x81, 0, 255, 3, 128, 1, 0, 77])
    lval = int.from_bytes(bpat, "big", signed=True)
    assert lval < 0
    q = [0.5] * dim
    got = spark.createDataFrame(
        [(lval, bytearray(bpat))], "code_l long, code_b binary"
    ).select(
        *[
            pq_adc_score_expr(
                books256, q, F.col(c), impl=i, layout=lay
            ).alias(f"{i}_{lay}")
            for c, lay in (("code_l", "long"), ("code_b", "binary"))
            for i in ("expr", "arrow")
        ]
    ).collect()[0]
    vals = [got[f"{i}_{lay}"] for lay in ("long", "binary")
            for i in ("expr", "arrow")]
    for v in vals[1:]:
        assert v == pytest.approx(vals[0], abs=1e-12), got


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


def test_adc_impl_layout_parity(spark, corpus, books):
    """All four scorer paths (expr|arrow × long|binary) are the same
    function: identical scores on every row, NULL code -> NULL score
    everywhere."""
    from animaltrackingetls_spark.operators.pq import pq_adc_score_expr

    encl = pq_encode(corpus, books, layout="long")
    encb = pq_encode(corpus, books, layout="binary",
                     out_col="pq_code_b")
    enc = encl.join(encb.select("vec_id", "pq_code_b"), "vec_id")
    enc = enc.localCheckpoint()
    q = [0.5] * DIM
    rows = enc.select(
        "vec_id",
        *[
            pq_adc_score_expr(
                books, q, F.col(c), impl=i, layout=lay
            ).alias(f"{i}_{lay}")
            for c, lay in (("pq_code", "long"), ("pq_code_b", "binary"))
            for i in ("expr", "arrow")
        ],
    ).collect()
    for r in rows:
        ref = r["expr_long"]
        for name in ("arrow_long", "expr_binary", "arrow_binary"):
            assert r[name] == pytest.approx(ref, abs=1e-12), r
    nulls = spark.createDataFrame(
        [(1, None, None)], "vec_id long, code_l long, code_b binary"
    ).select(
        *[
            pq_adc_score_expr(
                books, q, F.col(c), impl=i, layout=lay
            ).alias(f"{i}_{lay}")
            for c, lay in (("code_l", "long"), ("code_b", "binary"))
            for i in ("expr", "arrow")
        ]
    ).collect()[0]
    assert all(v is None for v in nulls.asDict().values())
    with pytest.raises(ValueError, match="impl"):
        pq_adc_score_expr(books, q, F.col("pq_code"), impl="nope")
    with pytest.raises(ValueError, match="layout"):
        pq_adc_score_expr(books, q, F.col("pq_code"), layout="short")


def test_topk_infers_layout_from_schema(spark, corpus, books):
    """pq_topk reads the code column's type, so long- and binary-coded
    corpora return the SAME ranking through the same call."""
    ql = pq_encode(corpus, books, layout="long").localCheckpoint()
    qb = pq_encode(corpus, books, layout="binary").localCheckpoint()
    q = [0.4] * DIM
    top_l = [(r["vec_id"], r["pq_score"]) for r in pq_topk(ql, books, q, k=7).collect()]
    top_b = [(r["vec_id"], r["pq_score"]) for r in pq_topk(qb, books, q, k=7).collect()]
    assert [i for i, _ in top_l] == [i for i, _ in top_b]
    for (_, a), (_, b) in zip(top_l, top_b):
        assert a == pytest.approx(b, abs=1e-12)


def test_rerank_fetch_modes_agree(spark, corpus, books):
    """fetch='pushdown' (IN-list point-read) and fetch='join'
    (broadcast semi-join) return identical rows."""
    enc = pq_encode(corpus, books).localCheckpoint()
    data = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    q = data[42]
    push = pq_topk_rerank(enc, books, q, k=10, oversample=5).collect()
    join = pq_topk_rerank(
        enc, books, q, k=10, oversample=5, fetch="join"
    ).collect()
    assert [(r["vec_id"], r["exact_score"]) for r in push] == [
        (r["vec_id"], r["exact_score"]) for r in join
    ]
    assert push[0]["vec_id"] == 42
    with pytest.raises(ValueError, match="fetch"):
        pq_topk_rerank(enc, books, q, k=3, fetch="scan")


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


# ---------------------------------------------------------------------------
# Frozen-codebook DuckDB oracle: the k-means FIT is not SQL-replayable
# (which keeps the pq_topk driver query rows-only), but encode + ADC
# GIVEN fixed codebooks is pure arithmetic. Freezing a tiny literal
# codebook lets DuckDB replay the packed-code extraction, the LUT build,
# and the LUT-sum ranking — the same move that promoted semantic_dedup
# to hash-checked in round 8. Scores are compared to 1e-12 relative
# (numpy's dgemm may fuse multiply-adds the SQL engine evaluates as
# separate mul+add; codes and ranking must match EXACTLY).
# ---------------------------------------------------------------------------

_FZ_BOOKS = [
    # book 0: 4 centroids over dims (0, 1)
    [[0.10, 0.25], [0.90, -0.40], [-0.35, 0.55], [0.70, 0.70]],
    # book 1: 4 centroids over dims (2, 3)
    [[-0.20, 0.15], [0.45, 0.80], [0.05, -0.65], [-0.90, -0.10]],
]
_FZ_VECS = [
    (0, [0.12, 0.22, -0.18, 0.12]),
    (1, [0.88, -0.35, 0.40, 0.85]),
    (2, [-0.30, 0.60, 0.10, -0.70]),
    (3, [0.65, 0.72, -0.85, -0.05]),
    (4, [0.05, 0.30, 0.50, 0.75]),
    (5, [0.95, -0.45, -0.25, 0.20]),
    (6, [-0.40, 0.50, 0.00, -0.60]),
    (7, [0.75, 0.65, -0.95, -0.15]),
    (8, [0.20, 0.10, 0.40, 0.90]),
    (9, [-0.25, 0.45, -0.15, 0.05]),
]
_FZ_Q = [0.30, 0.20, 0.10, -0.10]


def _frozen_books():
    return PQCodebooks(m=2, k=4, dim=4, metric="l2", books=_FZ_BOOKS)


def _fz_duck_sql(k: int | None = None) -> str:
    """Generate the DuckDB replay from the SAME literals: per-subspace
    argmin encode (first-minimum tie rule, matching numpy argmin),
    big-endian byte pack, query LUT, LUT-sum score, (score, id) order."""
    rows = ", ".join(
        f"({i}, [{', '.join(repr(x) for x in v)}])" for i, v in _FZ_VECS
    )

    def dists(j):
        exprs = []
        for c in _FZ_BOOKS[j]:
            v0, v1 = f"emb[{2 * j + 1}]", f"emb[{2 * j + 2}]"
            cc = f"({c[0]!r}*{c[0]!r} + {c[1]!r}*{c[1]!r})"
            dot = f"({v0}*{c[0]!r} + {v1}*{c[1]!r})"
            exprs.append(f"({cc} - 2.0*{dot})")
        return f"[{', '.join(exprs)}]"

    def lut(j):
        vals = []
        for c in _FZ_BOOKS[j]:
            q0, q1 = _FZ_Q[2 * j], _FZ_Q[2 * j + 1]
            vals.append(
                f"(({c[0]!r} - {q0!r})*({c[0]!r} - {q0!r})"
                f" + ({c[1]!r} - {q1!r})*({c[1]!r} - {q1!r}))"
            )
        return f"[{', '.join(vals)}]"

    limit = f"LIMIT {k}" if k else ""
    return f"""
        WITH v(vec_id, emb) AS (VALUES {rows}),
        d AS (
          SELECT vec_id, {dists(0)} AS d0, {dists(1)} AS d1 FROM v
        ),
        enc AS (
          SELECT vec_id,
                 (list_position(d0, list_min(d0)) - 1) AS b0,
                 (list_position(d1, list_min(d1)) - 1) AS b1
          FROM d
        )
        SELECT vec_id,
               (b0 * 256 + b1)::BIGINT AS pq_code,
               ({lut(0)}[b0 + 1] + {lut(1)}[b1 + 1]) AS score
        FROM enc
        ORDER BY score, vec_id
        {limit}
    """


def test_frozen_codebook_encode_matches_duckdb(spark):
    import duckdb

    books = _frozen_books()
    df = spark.createDataFrame(_FZ_VECS, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df, books).select("vec_id", "pq_code").collect()
    }
    oracle = duckdb.sql(_fz_duck_sql()).fetchall()
    want = {int(r[0]): int(r[1]) for r in oracle}
    assert got == want  # packed codes match bit-for-bit


@pytest.mark.parametrize("impl", ["arrow", "expr"])
def test_frozen_codebook_adc_ranking_matches_duckdb(spark, impl):
    import duckdb

    books = _frozen_books()
    df = spark.createDataFrame(_FZ_VECS, "vec_id long, embedding array<double>")
    enc = pq_encode(df, books)
    scored = enc.select(
        "vec_id",
        pq_adc_score_expr(books, _FZ_Q, F.col("pq_code"), impl=impl).alias(
            "score"
        ),
    ).orderBy("score", "vec_id")
    got = [(r["vec_id"], r["score"]) for r in scored.collect()]
    want = [(int(r[0]), float(r[2])) for r in duckdb.sql(_fz_duck_sql()).fetchall()]
    assert [g[0] for g in got] == [w[0] for w in want]  # exact rank order
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12, abs=1e-15)


def test_frozen_codebook_topk_matches_duckdb(spark):
    import duckdb

    books = _frozen_books()
    df = spark.createDataFrame(_FZ_VECS, "vec_id long, embedding array<double>")
    enc = pq_encode(df, books)
    got = [r["vec_id"] for r in pq_topk(enc, books, _FZ_Q, k=5).collect()]
    want = [int(r[0]) for r in duckdb.sql(_fz_duck_sql(k=5)).fetchall()]
    assert got == want

"""BM25 / TF-IDF retrieval: formula correctness, pruning, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from animaltrackingetls_spark.operators import retrieval
from animaltrackingetls_spark.operators.retrieval import (
    bm25_topk,
    term_frequencies,
    tf_idf_vectors,
)

CORPUS = [
    (0, "spark joins tables fast"),
    (1, "spark spark spark streaming"),
    (2, "window functions over partitions"),
    (3, "the quick brown fox"),
    (4, "spark window join"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _bm25_reference(query, k1=1.2, b=0.75):
    """Plain-Python BM25 over CORPUS for cross-checking."""
    toks = {i: t.lower().split() for i, t in CORPUS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in query
    }
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        hit = 0
        for t in query:
            tf = ts.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if hit:
            scores[i] = (round(s, 6), hit)
    return scores


def test_bm25_matches_reference_formula(spark):
    query = ["spark", "window"]
    got = {
        r.doc_id: (r.bm25, r.n_query_terms)
        for r in bm25_topk(_docs(spark), query, 10).collect()
    }
    assert got == _bm25_reference(query)


def test_bm25_only_matching_docs_scored(spark):
    out = bm25_topk(_docs(spark), ["fox"], 10).collect()
    assert [r.doc_id for r in out] == [3]


def test_bm25_ranking_order_and_k(spark):
    # doc 1 has tf=3 for 'spark' → highest saturation; k truncates.
    out = bm25_topk(_docs(spark), ["spark"], 2).collect()
    assert len(out) == 2
    assert out[0].doc_id == 1
    assert out[0].bm25 > out[1].bm25


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        term_frequencies(_docs(spark), [])


def test_term_frequencies_prunes_before_aggregation(spark):
    tf = term_frequencies(_docs(spark), ["spark"])
    plan = tf._jdf.queryExecution().optimizedPlan().toString()
    # the isin filter must sit below the Aggregate, not above it
    agg_pos = plan.index("Aggregate")
    filter_pos = plan.index("Filter")
    assert filter_pos > agg_pos  # optimizedPlan prints top-down: Filter deeper


def test_bm25_topk_plan_is_take_ordered(spark):
    out = bm25_topk(_docs(spark), ["spark", "window"], 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global Sort


def test_tf_idf_weights(spark):
    w = {
        (r.id, r.term): r.weight
        for r in tf_idf_vectors(_docs(spark)).collect()
    }
    # 'spark' appears in 3 of 5 docs; doc 1 has tf=3
    assert w[(1, "spark")] == pytest.approx(3 * math.log(5 / 3))
    # hapax in one doc: tf=1, df=1
    assert w[(3, "fox")] == pytest.approx(math.log(5.0))


def test_tf_idf_min_df_drops_rare_terms(spark):
    w = tf_idf_vectors(_docs(spark), min_df=2)
    terms = {r.term for r in w.collect()}
    assert "fox" not in terms and "spark" in terms


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------


def _fusion_fixtures(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join"),          # lexical hit
            (1, "spark spark spark shuffle"),   # strong lexical hit
            (2, "nothing relevant here"),
            (3, "join query shuffle spark"),    # lexical hit
            (4, "pandas numpy"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # near query
            (2, [1.0, 0.05, 0.0]),  # nearest query
            (3, [0.0, 1.0, 0.0]),   # orthogonal
            (4, [0.0, 0.0, 1.0]),   # orthogonal
        ],
        "vec_id long, embedding array<double>",
    )
    return docs, emb


def test_rrf_fusion_combines_both_retrievers(spark):
    docs, emb = _fusion_fixtures(spark)
    out = retrieval.rrf_fusion(
        docs, emb, ["spark", "shuffle"], query_vec_id=0, k=5, pool=3
    ).collect()
    rows = {r.doc_id: r for r in out}
    # doc1: top lexical AND near the query vector → ranked above
    # lexical-only (doc3) and vector-only (doc2) entries
    assert out[0].doc_id == 1
    assert rows[1].lex_rank is not None and rows[1].vec_rank is not None
    # vector-only doc2 still reaches the fused list with NULL lex_rank
    assert rows[2].lex_rank is None and rows[2].vec_rank is not None
    # rrf arithmetic: exactly 1/(60+lex) + 1/(60+vec) with NULL→0
    for r in out:
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (60 + r.lex_rank)
        if r.vec_rank is not None:
            expect += 1.0 / (60 + r.vec_rank)
        assert abs(r.rrf - expect) < 1e-9
    # self-match excluded from the dense side
    assert rows.get(0) is None or rows[0].vec_rank is None


def test_rrf_fusion_respects_k_and_pool(spark):
    docs, emb = _fusion_fixtures(spark)
    out = retrieval.rrf_fusion(
        docs, emb, ["spark"], query_vec_id=0, k=2, pool=2
    ).collect()
    assert len(out) == 2
    # pool=2 means no rank beyond 2 on either side
    for r in out:
        assert r.lex_rank is None or r.lex_rank <= 2
        assert r.vec_rank is None or r.vec_rank <= 2


def test_rrf_fusion_rejects_bad_k_rrf(spark):
    docs, emb = _fusion_fixtures(spark)
    with pytest.raises(ValueError, match="k_rrf"):
        retrieval.rrf_fusion(docs, emb, ["spark"], 0, k_rrf=0)
